"""SyntheticTextureVideoDataset property tests (VERDICT r3 weak #4).

The big-bank convergence soaks must not be explainable by color histograms.
This file proves the texture family's defining property directly on the data:

  1. color statistics carry ~zero identity information — a nearest-centroid
     classifier on (mean RGB ⊕ per-channel histograms) sits at chance,
  2. translation-invariant spatial features (|FFT| of the intensity channel)
     identify videos nearly perfectly under the same per-frame jitter,

so any encoder that learns this family above chance learned spatial
structure. The learning evidence itself comes from the soak recipe
(tools/soak_contrastive.py / STATUS.md), which trains the production step on
this dataset.
"""

import types

import numpy as np
import pytest

from vince_tpu.data.synthetic_dataset import (
    SyntheticTextureVideoDataset,
    SyntheticVideoDataset,
)

N_VIDEOS = 32
FRAMES_PER_VIDEO = 6


def _args(canvas=64):
    a = types.SimpleNamespace()
    a.num_frames = 1
    a.input_width = canvas
    a.input_height = canvas
    a.repeatable = False
    return a


@pytest.fixture(scope="module")
def frames():
    """[N_VIDEOS, FRAMES_PER_VIDEO, C, C, 3] uint8 — independently jittered
    frames of each identity (the view a contrastive model sees)."""
    ds = SyntheticTextureVideoDataset(_args(), "train", num_videos=N_VIDEOS,
                                      num_images_to_return=FRAMES_PER_VIDEO)
    out = np.stack([ds[i]["data"] for i in range(N_VIDEOS)])
    assert out.dtype == np.uint8
    return out


def _color_features(x):
    """mean RGB + 16-bin per-channel histograms — the 'color histogram
    encoder' strawman."""
    feats = [x.reshape(-1, 3).mean(0)]
    for c in range(3):
        h, _ = np.histogram(x[..., c], bins=16, range=(0, 256), density=True)
        feats.append(h * 32.0)  # comparable scale to mean RGB
    return np.concatenate(feats)


def _fft_features(x):
    """|FFT| of the grayscale channel, low-frequency crop — translation
    invariant (np.roll jitter only changes phase), so it sees exactly the
    grating structure the family encodes."""
    g = x.astype(np.float32).mean(-1)
    g = (g - g.mean()) / (g.std() + 1e-6)
    mag = np.abs(np.fft.fft2(g))
    mag = np.fft.fftshift(mag)
    c = mag.shape[0] // 2
    crop = mag[c - 16:c + 16, c - 16:c + 16].ravel()
    return crop / (np.linalg.norm(crop) + 1e-9)


def _nn_retrieval_accuracy(featurize, frames):
    """Leave-one-frame-out nearest neighbor: does frame 0 of each video
    retrieve another frame of the SAME video?"""
    n, t = frames.shape[:2]
    feats = np.stack([
        np.stack([featurize(frames[i, j]) for j in range(t)]) for i in range(n)
    ])
    flat = feats.reshape(n * t, -1)
    flat = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-9)
    hits = 0
    for i in range(n):
        q = flat[i * t]
        sims = flat @ q
        sims[i * t] = -np.inf  # exclude self
        hits += int(np.argmax(sims) // t == i)
    return hits / n


def test_color_statistics_are_identical_across_identities():
    """Scene-level (pre-jitter) color statistics are IDENTICAL across
    identities by construction: every cell's intensities are rank-mapped onto
    the same fixed ramp, so the pixel-color multiset of every scene is the
    same. (Per-frame gain jitter then adds random — identity-free — noise on
    top; the retrieval test below covers the jittered view.)"""
    ds = SyntheticTextureVideoDataset(_args(), "train", num_videos=N_VIDEOS)
    scenes = np.stack([ds._scene(i) for i in range(N_VIDEOS)])
    sorted_pixels = np.sort(scenes.reshape(N_VIDEOS, -1, 3), axis=1)
    for i in range(1, N_VIDEOS):
        np.testing.assert_array_equal(sorted_pixels[i], sorted_pixels[0])

    # contrast with the color family, where across-video spread dominates
    across = scenes.reshape(N_VIDEOS, -1, 3).mean(1).std(0).mean()
    ds_c = SyntheticVideoDataset(_args(), "train", num_videos=N_VIDEOS,
                                 num_images_to_return=1)
    color_frames = np.stack([ds_c[i]["data"][0] for i in range(N_VIDEOS)])
    color_across = color_frames.reshape(N_VIDEOS, -1, 3).mean(1).std(0).mean()
    assert across < 1e-9, across  # identical multisets; fp summation noise
    assert color_across > 10.0, color_across


def test_color_histogram_classifier_at_chance(frames):
    acc = _nn_retrieval_accuracy(_color_features, frames)
    # chance = 1/N_VIDEOS ≈ 0.031; allow generous noise headroom
    assert acc <= 0.2, acc


def test_spatial_features_separate_identities(frames):
    acc = _nn_retrieval_accuracy(_fft_features, frames)
    assert acc >= 0.9, acc


def test_item_contract_matches_video_family():
    ds = SyntheticTextureVideoDataset(_args(48), "train", num_videos=4,
                                      num_images_to_return=2)
    item = ds[1]
    assert set(item) == {"data", "queue_data", "ind", "id"}
    assert item["data"].shape == item["queue_data"].shape
    assert item["data"].shape[0] == 2
    assert item["data"].dtype == np.uint8
    # val split draws different identities than train (seed offset)
    ds_val = SyntheticTextureVideoDataset(_args(48), "val", num_videos=4,
                                          num_images_to_return=2)
    assert not np.array_equal(ds_val[1]["data"], item["data"])
    # repeatable mode: same item twice → identical bytes
    a = _args(48)
    a.repeatable = True
    ds_rep = SyntheticTextureVideoDataset(a, "train", num_videos=4,
                                          num_images_to_return=2)
    np.testing.assert_array_equal(ds_rep[2]["data"], ds_rep[2]["data"])


def _class_nn_accuracy(featurize, samples, labels):
    """Leave-one-out nearest neighbor over labeled samples → class accuracy."""
    feats = np.stack([featurize(s) for s in samples])
    feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-9)
    hits = 0
    for i in range(len(samples)):
        sims = feats @ feats[i]
        sims[i] = -np.inf
        hits += int(labels[np.argmax(sims)] == labels[i])
    return hits / len(samples)


def _labeled_args(canvas=64):
    a = _args(canvas)
    a.end_task_classifier_num_classes = 4
    return a


def test_texture_image_dataset_is_color_blind_but_fft_separable():
    """The labeled end-task family (VERDICT r4 weak #5): class identity must
    be invisible to color statistics and visible to spatial features — same
    property the video family proves, now for the classifier-probe data."""
    from vince_tpu.data.synthetic_dataset import SyntheticTextureImageDataset

    ds = SyntheticTextureImageDataset(_labeled_args(), "train", num_images=64)
    samples = [ds[i]["data"][0] for i in range(64)]
    labels = [int(ds[i]["classifier_labels"][0]) for i in range(64)]
    # pre-jitter class scenes: pixel multisets identical across classes
    sorted_pixels = np.sort(
        np.stack(ds.class_scenes).reshape(len(ds.class_scenes), -1, 3), axis=1
    )
    for i in range(1, len(ds.class_scenes)):
        np.testing.assert_array_equal(sorted_pixels[i], sorted_pixels[0])
    acc_color = _class_nn_accuracy(_color_features, samples, labels)
    acc_fft = _class_nn_accuracy(_fft_features, samples, labels)
    assert acc_color <= 0.45, acc_color  # chance = 0.25
    assert acc_fft >= 0.9, acc_fft


def test_texture_clip_dataset_contract_and_color_blindness():
    from vince_tpu.data.synthetic_dataset import SyntheticTextureClipDataset

    a = _labeled_args()
    a.num_frames = 2
    ds = SyntheticTextureClipDataset(a, "train", num_clips=32)
    item = ds[3]
    assert item["data"].shape[0] == 2
    assert item["data"].dtype == np.uint8
    assert int(item["labels"]) == 3 % ds.num_classes
    samples = [ds[i]["data"][0] for i in range(32)]
    labels = [int(ds[i]["labels"]) for i in range(32)]
    assert _class_nn_accuracy(_color_features, samples, labels) <= 0.5
    assert _class_nn_accuracy(_fft_features, samples, labels) >= 0.9


def test_texture_tracking_sequences_color_indistinguishable():
    """TextureSequences: the target box's color statistics must match a
    same-sized background patch (no brightness shortcut), while FFT features
    distinguish target from background texture."""
    from vince_tpu.tracking.sequences import TextureSequences
    from vince_tpu.tracking.ops import read_image

    seqs = TextureSequences(num_seqs=2, num_frames=3, size=160, target=40)
    img_files, anno = seqs[0]
    frame = read_image(img_files[0])
    x, y, w, h = (int(round(v)) for v in anno[0])
    x, y = x - 1, y - 1  # 1-indexed boxes
    tgt = frame[y:y + h, x:x + w]
    # a background patch away from the target
    bx = 0 if x > 50 else frame.shape[1] - w
    bg = frame[0:h, bx:bx + w]
    # color histograms nearly identical (jpg quantization slack)
    ht, _ = np.histogram(tgt.mean(-1), bins=16, range=(0, 256), density=True)
    hb, _ = np.histogram(bg.mean(-1), bins=16, range=(0, 256), density=True)
    assert np.abs(ht - hb).sum() * 256 / 16 <= 0.35, np.abs(ht - hb).sum()
    # texture differs: normalized FFT features far apart
    ft, fb = _fft_features(tgt), _fft_features(bg)
    assert float(ft @ fb) < 0.8, float(ft @ fb)
