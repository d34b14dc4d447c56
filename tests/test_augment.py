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


def test_global_row_keyed_sharding_invariance():
    """augment_batch(global_batch, row_offset) — each shard's augmentation
    must equal the corresponding rows of the full-batch call, so the
    randomness stream is invariant to how the batch is sharded (the
    mesh-shape-invariance contract used by vince_step._augment_sources)."""
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randint(0, 256, (16, 48, 48, 3), np.uint8))
    cfg = AugmentConfig(size=(32, 32), blur_prob=0.5)
    key = jax.random.PRNGKey(11)
    full = np.asarray(
        augment_batch(key, imgs, cfg, train=True, global_batch=16, row_offset=0)
    )
    for shards in (2, 4, 8):
        b = 16 // shards
        parts = [
            np.asarray(
                augment_batch(key, imgs[i * b:(i + 1) * b], cfg, train=True,
                              global_batch=16, row_offset=i * b)
            )
            for i in range(shards)
        ]
        np.testing.assert_array_equal(np.concatenate(parts, 0), full)


def test_global_row_keyed_grouped_sharding_invariance():
    """Same invariance with group_size>1 (Kinetics clip semantics): shard
    boundaries land on whole clips."""
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 256, (16, 48, 48, 3), np.uint8))
    cfg = AugmentConfig(size=(32, 32))
    key = jax.random.PRNGKey(12)
    full = np.asarray(
        augment_batch(key, imgs, cfg, train=True, group_size=4,
                      global_batch=16, row_offset=0)
    )
    parts = [
        np.asarray(
            augment_batch(key, imgs[i * 8:(i + 1) * 8], cfg, train=True,
                          group_size=4, global_batch=16, row_offset=i * 8)
        )
        for i in range(2)
    ]
    np.testing.assert_array_equal(np.concatenate(parts, 0), full)


# ---------------------------------------------------------------------------
# ColorJitter torchvision parity (VERDICT r2 #5): per-sample random op order
# + exact HSV hue, verified against an independent numpy oracle implementing
# torchvision's float-tensor functional semantics (F.adjust_brightness/
# contrast/saturation/hue; _blend clamps to [0,1]; hue = HSV h+shift mod 1).
# Documented deviation: grayscale weights 0.299 (PIL) vs torchvision tensor
# mode's 0.2989 — below uint8 quantization.


def _np_gray(img):
    return (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]


def _np_blend(a, b, f):
    return np.clip(a * f + b * (1.0 - f), 0.0, 1.0)


def _np_rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    rc = (maxc - r) / np.maximum(delta, 1e-12)
    gc = (maxc - g) / np.maximum(delta, 1e-12)
    bc = (maxc - b) / np.maximum(delta, 1e-12)
    h = np.where(maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _np_hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(np.int64) % 6
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], -1)


def _np_jitter_one(img, order, fb, fc, fs, fh):
    """One sample, torchvision ColorJitter.forward loop."""
    for op in order:
        if op == 0:
            img = _np_blend(img, np.zeros_like(img), fb)
        elif op == 1:
            mean = _np_gray(img).mean()
            img = _np_blend(img, np.full_like(img, mean), fc)
        elif op == 2:
            img = _np_blend(img, np.broadcast_to(_np_gray(img), img.shape), fs)
        else:
            h, s, v = _np_rgb_to_hsv(img)
            img = _np_hsv_to_rgb((h + fh) % 1.0, s, v)
    return img


def test_color_jitter_matches_numpy_oracle():
    """Fused jitter vs a SELF-AUTHORED numpy oracle of torchvision semantics.

    torchvision is not installed in this sandbox, so the oracle above encodes
    our *reading* of ColorJitter.forward (per-sample op order, blend-based
    brightness/contrast/saturation, exact HSV hue) — not the library itself.
    Verify against real torchvision on the first networked host:
    docs/NETWORKED_TODO.md item 2.
    """
    from itertools import permutations

    from vince_tpu.ops.augment import color_jitter_apply

    rng = np.random.RandomState(8)
    n = 24
    img = rng.rand(n, 12, 12, 3).astype(np.float32)
    orders = np.array(list(permutations(range(4))), np.int32)  # all 24 orders
    fb = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fc = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fs = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fh = rng.uniform(-0.2, 0.2, n).astype(np.float32)

    cfg = AugmentConfig(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.2)
    ours = np.asarray(color_jitter_apply(
        jnp.asarray(img), jnp.asarray(orders),
        jnp.asarray(fb), jnp.asarray(fc), jnp.asarray(fs), jnp.asarray(fh), cfg,
    ))
    want = np.stack([
        _np_jitter_one(img[i], orders[i], fb[i], fc[i], fs[i], fh[i])
        for i in range(n)
    ])
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_color_jitter_order_actually_varies():
    """The batched wrapper draws per-sample random op orders: across many
    samples on a fixed image, outputs must take >>1 distinct values that are
    explained by order alone (all factors equal)."""
    from vince_tpu.ops.augment import _color_jitter_batch

    img = jnp.asarray(np.random.RandomState(9).rand(1, 8, 8, 3).astype(np.float32))
    batch = jnp.tile(img, (64, 1, 1, 1))
    cfg = AugmentConfig(brightness=0.8, contrast=0.8, saturation=0.8, hue=0.4,
                        jitter_order="torchvision")
    out = np.asarray(_color_jitter_batch(jax.random.PRNGKey(3), batch, cfg))
    # same input, iid params+orders ⇒ effectively all distinct outputs
    flat = out.reshape(64, -1)
    distinct = len({flat[i].tobytes() for i in range(64)})
    assert distinct > 60, distinct


def test_color_jitter_hue_exact_hsv():
    """Hue-only jitter must equal the HSV re-map (not a YIQ rotation)."""
    from vince_tpu.ops.augment import color_jitter_apply

    rng = np.random.RandomState(10)
    img = rng.rand(4, 8, 8, 3).astype(np.float32)
    fh = np.array([0.1, -0.15, 0.3, -0.45], np.float32)
    cfg = AugmentConfig(brightness=0, contrast=0, saturation=0, hue=0.5)
    ones = jnp.ones(4, jnp.float32)
    perm = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (4, 1))
    ours = np.asarray(color_jitter_apply(
        jnp.asarray(img), perm, ones, ones, ones, jnp.asarray(fh), cfg))
    h, s, v = _np_rgb_to_hsv(img)
    want = _np_hsv_to_rgb((h + fh[:, None, None]) % 1.0, s, v)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_no_image_sized_gathers_in_train_lowering():
    """Perf regression guard: the fused train augmentation must never lower
    to a gather over image-sized operands. jnp.choose (and any vmap/gather
    formulation) lowers to stablehlo.gather, which runs on the TPU scalar
    core — measured +2.5 s/step at b=128@224 when the HSV sextant dispatch
    used choose. Small parameter-table gathers ([B,10] crop attempts) are
    fine; anything over 1 MB is a bug."""
    import re

    from vince_tpu.ops.augment import augment_batch

    cfg = AugmentConfig(size=(64, 64), brightness=0.4, contrast=0.4,
                        saturation=0.4, hue=0.2, blur_prob=0.5,
                        jitter_order="torchvision")
    x = jnp.zeros((8, 73, 73, 3), jnp.uint8)
    text = (
        jax.jit(lambda r, im: augment_batch(r, im, cfg, train=True))
        .lower(jax.random.PRNGKey(0), x)
        .as_text()
    )
    big = []
    for m in re.finditer(r'"stablehlo\.(?:gather|scatter)"[^\n]*->\s*tensor<([\dx]+)x', text):
        dims = [int(d) for d in m.group(1).split("x") if d]
        n = 1
        for d in dims:
            n *= d
        if n * 4 > 1_000_000:
            big.append((m.group(0)[:120], n))
    assert not big, big
