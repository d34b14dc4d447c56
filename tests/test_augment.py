"""On-device augmentation: shapes, determinism, distributional sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vince_tpu.ops.augment import (
    AugmentConfig,
    _rgb_to_hsv,
    _hsv_to_rgb,
    augment_batch,
    val_resize_center_crop,
)
from vince_tpu.utils import transforms as T


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 256, size=(4, 64, 48, 3), dtype=np.uint8))


CFG = AugmentConfig(size=(32, 32), blur_prob=0.5)


def test_shapes_and_dtype(images):
    out = augment_batch(jax.random.PRNGKey(0), images, CFG, train=True)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    out_bf16 = augment_batch(jax.random.PRNGKey(0), images, CFG, train=True, dtype=jnp.bfloat16)
    assert out_bf16.dtype == jnp.bfloat16


def test_deterministic_given_key_shared_transform(images):
    """Same rng ⇒ identical augmentation — the reference shared_transform
    re-seeding semantics (r2v2_dataset.py:81-83)."""
    a = augment_batch(jax.random.PRNGKey(7), images, CFG, train=True)
    b = augment_batch(jax.random.PRNGKey(7), images, CFG, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_batch(jax.random.PRNGKey(8), images, CFG, train=True)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_per_sample_independent_randomness():
    img = jnp.tile(jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, 64, 64, 3), np.uint8)), (8, 1, 1, 1))
    out = augment_batch(jax.random.PRNGKey(0), img, CFG, train=True)
    out = np.asarray(out)
    diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 8)]
    assert max(diffs) > 1e-3  # identical inputs, different augmentations


def test_val_path_center_crop(images):
    cfg = AugmentConfig(size=(32, 32), normalize=False)
    out = augment_batch(jax.random.PRNGKey(0), images, cfg, train=False)
    assert out.shape == (4, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    direct = val_resize_center_crop(images.astype(jnp.float32) / 255.0, (32, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-6)


def test_normalization_stats(images):
    out = augment_batch(jax.random.PRNGKey(0), images, CFG, train=False)
    # uniform-noise input ≈ mean 0.5 → normalized values well within (-3, 3)
    assert float(jnp.abs(out).max()) < 3.5


def test_grayscale_always():
    cfg = AugmentConfig(
        size=(16, 16), grayscale_prob=1.0, brightness=0, contrast=0,
        saturation=0, hue=0, hflip_prob=0, normalize=False, crop_scale=(1.0, 1.0),
        crop_ratio=(1.0, 1.0),
    )
    img = jnp.asarray(np.random.RandomState(2).randint(0, 256, (2, 16, 16, 3), np.uint8))
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), img, cfg, train=True))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-5)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-5)


def test_hsv_roundtrip():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    back = _hsv_to_rgb(_rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_blur_reduces_variance():
    cfg = AugmentConfig(
        size=(32, 32), blur_prob=1.0, brightness=0, contrast=0, saturation=0,
        hue=0, grayscale_prob=0, hflip_prob=0, normalize=False,
        crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0), blur_sigma=(2.0, 2.0),
    )
    img = jnp.asarray(np.random.RandomState(4).randint(0, 256, (2, 32, 32, 3), np.uint8))
    out = augment_batch(jax.random.PRNGKey(0), img, cfg, train=True)
    assert float(jnp.var(out)) < float(jnp.var(img.astype(jnp.float32) / 255.0)) * 0.6


def test_crop_scale_distribution():
    """RRC with scale (1,1) and square ratio ⇒ identity crop of a square img."""
    cfg = AugmentConfig(
        size=(32, 32), crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
        brightness=0, contrast=0, saturation=0, hue=0, grayscale_prob=0,
        hflip_prob=0, normalize=False,
    )
    img = jnp.asarray(np.random.RandomState(5).randint(0, 256, (1, 32, 32, 3), np.uint8))
    out = augment_batch(jax.random.PRNGKey(0), img, cfg, train=True)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(img[0], np.float32) / 255.0, atol=2e-2
    )


def test_registry_parity_with_reference():
    assert set(T.__all__) == {
        "BasicImagenetTransform", "StandardVideoTransform", "SimCLRTransform",
        "JigsawTransform", "SunSceneTransform", "Kinetics400Transform",
        "GOT10KTransform", "RepeatedImagenetTransform", "MoCoV1ImagenetTransform",
        "MoCoV2ImagenetTransform",
    }
    cfg = T.make_config("SimCLRTransform", 224)
    assert cfg.blur_prob == 0.5 and cfg.brightness == 0.8 and cfg.blur_kernel == 23
    cfg = T.make_config("MoCoV1ImagenetTransform", 224)
    assert cfg.crop_scale == (0.08, 1.0)
    cfg = T.make_config("GOT10KTransform", (128, 128))
    assert cfg.brightness == 0.0 and cfg.grayscale_prob == 0.0


def test_jit_compiles_once():
    cfg = AugmentConfig(size=(32, 32))
    fn = jax.jit(lambda k, im: augment_batch(k, im, cfg, train=True))
    img = jnp.zeros((2, 48, 48, 3), jnp.uint8)
    out = fn(jax.random.PRNGKey(0), img)
    assert out.shape == (2, 32, 32, 3)
