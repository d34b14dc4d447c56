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
