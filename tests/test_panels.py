"""Visualization panels + drawing utils (host-side numpy/cv2)."""

import numpy as np

from vince_tpu.utils.drawing import draw_border, draw_contrast_text_cv2, subplot
from vince_tpu.utils.util_functions import to_uint8
from vince_tpu.visualizations import panels


def _imgs(n, h=32, w=32, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (n, h, w, 3), np.uint8)


def test_subplot_grid():
    grid = subplot(list(_imgs(6)), 2, 3, 32, 32)
    assert grid.shape == (64, 96, 3) and grid.dtype == np.uint8
    grid_b = subplot(list(_imgs(2)), 2, 3, 32, 32, border=5)
    assert grid_b.shape == (2 * 42, 3 * 42, 3)


def test_draw_helpers():
    img = _imgs(1)[0]
    out = draw_border(img.copy(), (255, 0, 0), width=4)
    assert (out[:4] == (255, 0, 0)).all()
    out2 = draw_contrast_text_cv2(img.copy(), "hello", (5, 20))
    assert out2.shape == img.shape


def test_to_uint8_roundtrip():
    from vince_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.RandomState(1)
    raw = rng.rand(2, 16, 16, 3).astype(np.float32)
    normalized = (raw - IMAGENET_MEAN) / IMAGENET_STD
    back = to_uint8(normalized)
    np.testing.assert_allclose(back, np.clip(raw * 255, 0, 255).astype(np.uint8), atol=2)
    padded = to_uint8(normalized, padding=3)
    assert padded.shape == (2, 22, 22, 3)


def test_input_pair_grid_and_nn_panel():
    data = _imgs(8)
    keys = _imgs(8, seed=2)
    grid = panels.input_pair_grid(data, keys, num_frames=2)
    assert grid.dtype == np.uint8 and grid.ndim == 3

    sims = np.random.RandomState(3).randn(8, 8 + 16).astype(np.float32)
    mask = np.zeros((8, 24), bool)
    groups = np.arange(8) // 2
    mask[:, :8] = groups[:, None] == groups[None, :]
    queue_imgs = list(_imgs(16, 8, 8, seed=4))
    panel = panels.nearest_neighbor_panel(
        data, keys, sims, mask, queue_imgs, ["YT"] * 16
    )
    assert panel.dtype == np.uint8 and panel.shape[0] == panel.shape[1]


def test_prediction_grid_and_attention():
    data = _imgs(9)
    logits = np.random.RandomState(5).randn(9, 10).astype(np.float32)
    labels = np.arange(9) % 10
    grid = panels.imagenet_prediction_grid(data, logits, labels)
    assert grid.dtype == np.uint8

    masks = np.random.RandomState(6).rand(9, 4, 4, 1).astype(np.float32)
    overlay = panels.attention_overlay(data[0], masks[0])
    assert overlay.shape == data[0].shape
    panel = panels.attention_panel(data, data, masks, masks, max_images=4)
    assert panel.dtype == np.uint8


def test_tsne_and_nn_grid():
    from vince_tpu.visualizations.dataset_mosaic import tsne_image
    from vince_tpu.visualizations.view_nearest_neighbors import nn_grid, pca_reduce

    feats = np.random.RandomState(7).randn(30, 128).astype(np.float32)
    imgs = _imgs(30, 16, 16)
    reduced = pca_reduce(feats, 8)
    assert reduced.shape == (30, 8)
    grid = nn_grid(imgs, feats, n_queries=3, n_neighbors=4)
    assert grid.dtype == np.uint8
    canvas = tsne_image(feats, imgs, canvas_size=256, thumb=16)
    assert canvas.shape == (256, 256, 3)
