"""Video filter cascade + tracking crop ops (host-side, cv2-based)."""

import numpy as np
import pytest

from vince_tpu.utils import video_utils
from vince_tpu.tracking.ops import get_cropped_input, iou_xyxy, xywh_to_xyxy


def _frames(n=6, size=128, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (size, size, 3), np.uint8) for _ in range(n)]


def test_filter_similar_frames_drops_duplicates():
    frames = _frames(3)
    seq = [frames[0], frames[0], frames[1], frames[1], frames[2]]
    kept, inds = video_utils.filter_similar_frames(seq, return_inds=True)
    assert list(inds) == [0, 2, 4]


def test_filter_laplacian_drops_blurry():
    import cv2

    sharp = _frames(1)[0]
    blurry = cv2.GaussianBlur(sharp, (31, 31), 12)
    kept, inds = video_utils.filter_using_laplacian(
        np.stack([sharp, blurry, sharp]), return_inds=True
    )
    assert 1 not in list(inds) and 0 in list(inds)


def test_remove_border_crops_letterbox():
    frames = _frames(4, size=120)
    boxed = []
    for f in frames:
        g = np.zeros_like(f)
        g[20:100, 10:110] = f[20:100, 10:110]
        boxed.append(g)
    cropped, (x1, x2, y1, y2) = video_utils.remove_border(boxed, return_inds=True)
    assert y1 >= 10 and y2 <= 110 and x1 >= 4 and x2 <= 116
    assert cropped[0].shape[0] < 120 and cropped[0].shape[1] < 120


def test_get_shots_detects_cut():
    a = np.full((64, 64, 3), 30, np.uint8)
    b = np.full((64, 64, 3), 220, np.uint8)
    seq = np.stack([a] * 4 + [b] * 4)
    shots, borders = video_utils.get_shots(seq, return_inds=True)
    assert len(shots) == 2 and borders == [0, 4, 8]


def test_max_resize():
    img = np.zeros((200, 400, 3), np.uint8)
    out = video_utils.max_resize(img, 100)
    assert max(out.shape[:2]) == 100 and out.shape[:2] == (50, 100)
    assert video_utils.max_resize(img, 500) is img  # no-op under limit


def test_get_cropped_input_identity_and_oob():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    crop, m = get_cropped_input(img, [0, 0, 64, 64], 1.0, 64)
    np.testing.assert_allclose(crop, img, atol=2)
    # out-of-bounds crop pads with mean color, no crash
    crop2, _ = get_cropped_input(img, [-32, -32, 32, 32], 1.0, 64)
    assert crop2.shape == (64, 64, 3)
    pad_region = crop2[:10, :10].astype(np.float32)
    assert abs(pad_region.mean() - img.mean()) < 30


def test_iou_and_boxes():
    a = xywh_to_xyxy(np.array([0, 0, 10, 10]))
    b = xywh_to_xyxy(np.array([5, 5, 10, 10]))
    assert abs(iou_xyxy(a, b) - 25.0 / 175.0) < 1e-6
    assert iou_xyxy(a, a) == 1.0
