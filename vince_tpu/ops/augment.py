"""On-device fused image augmentation (XLA, batched, MXU-mapped).

This replaces the reference's host-side PIL pipeline (``utils/transforms.py``)
— the dataloader→GPU hot path that BASELINE.json's north star moves on-device.

TPU-first design (v2, after profiling): all *geometric* ops — random-resized
crop, horizontal flip, and gaussian blur — are expressed as per-sample
**separable linear operators** applied as two batched matmuls
(``out = W_y · img · W_xᵀ``), so they run on the MXU instead of as
gather/scatter chains; color ops are batch-vectorized elementwise VPU work
with no per-sample vmap. Measured: the previous vmap/gather implementation
took ~1.5 s for a 128×256² batch on a v5e chip; this formulation is
O(milliseconds).

Behavioral parity targets (parameter distributions, not pixel-exact PIL
reproduction — deviations documented):

  - RandomResizedCrop: torchvision semantics — area ~ U(scale)·A, aspect ~
    exp(U(log ratio)), 10 rejection-sampling attempts then center-crop
    fallback (reference transforms.py:67 etc.). Resampling is pure bilinear
    (no antialiasing prefilter on downscale — PIL area-averages; at the ≤1.3×
    downscale ratios this pipeline sees, the difference is negligible).
  - ColorJitter(brightness, contrast, saturation, hue): torchvision
    float-tensor semantics (reference transforms.py:68) — per-sample random
    op order (randperm(4) per call) and exact HSV hue re-map
    (``jitter_order="torchvision"``, the default). ``jitter_order="fixed"``
    keeps the cheaper fixed b→c→s→hue order with YIQ-plane hue rotation
    (round-1 behavior). Remaining deviation in both modes: float math on
    unit-range tensors, not PIL's uint8 ImageEnhance arithmetic; grayscale
    weights are PIL's 0.299/0.587/0.114 (torchvision tensor mode uses
    0.2989 — difference below uint8 quantization).
  - RandomGrayscale(p), RandomHorizontalFlip, Normalize (:70-73).
  - RandomGaussianBlur: kernel = size//10 (truncated), sigma ~ U(0.1, 2.0),
    probability p (reference util_functions.py:104-132, transforms.py:115) —
    as a per-sample banded Toeplitz operator pair.
  - Val path: resize(size/0.875) + center crop + normalize (:77-86).

Transform *pipelines* (named configs matching ``transforms.__all__``) live in
``vince_tpu.utils.transforms``.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from vince_tpu.constants import IMAGENET_MEAN, IMAGENET_STD


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    size: Tuple[int, int] = (224, 224)
    crop_scale: Tuple[float, float] = (0.2, 1.0)
    crop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    brightness: float = 0.4
    contrast: float = 0.4
    saturation: float = 0.4
    hue: float = 0.2
    color_jitter_prob: float = 1.0  # reference applies jitter unconditionally
    grayscale_prob: float = 0.2
    hflip_prob: float = 0.5
    blur_prob: float = 0.0  # 0.5 for SimCLR/MoCoV2 pipelines
    blur_sigma: Tuple[float, float] = (0.1, 2.0)
    normalize: bool = True
    # "torchvision": per-sample random op order + exact HSV hue (parity);
    # "fixed": b→c→s→hue with YIQ hue rotation (cheaper; round-1 behavior)
    jitter_order: str = "torchvision"

    @property
    def blur_kernel(self) -> int:
        k = max(self.size[0] // 10, 3)
        return k + 1 - (k % 2)  # odd


# ---------------------------------------------------------------------------
# color helpers (kept for parity tests / external use)


def _rgb_to_grayscale(img):
    # ITU-R 601-2 luma (PIL convert("L") weights, used by torchvision)
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return jnp.tensordot(img, w, axes=([-1], [0]))[..., None]


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = (maxc - r) / jnp.maximum(delta, 1e-12)
    gc = (maxc - g) / jnp.maximum(delta, 1e-12)
    bc = (maxc - b) / jnp.maximum(delta, 1e-12)
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    # sextant dispatch as a pure select chain — NEVER jnp.choose here: choose
    # lowers to a per-element stablehlo.gather over the stacked candidates,
    # which runs on the TPU scalar core (measured: +2.5 s/step at b=128@224,
    # the round-1 vmap/gather failure mode all over again)
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0, jnp.where(i == 1, c1, jnp.where(
                i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# YIQ hue rotation (fast hue-adjust); luma preserved exactly.
# NOTE: plain-python constants — creating jnp arrays at module import would
# initialize the default JAX backend before the CLI's --platform override.
import numpy as _np

_RGB2YIQ = _np.array(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], _np.float32
)
_YIQ2RGB = _np.array(
    [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]], _np.float32
)


def _hue_rotate(img, shift):
    """img [B,H,W,3], shift [B] in [-0.5, 0.5] turns."""
    theta = (2.0 * jnp.pi) * shift
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    yiq = jnp.einsum("bhwc,dc->bhwd", img, jnp.asarray(_RGB2YIQ))
    y = yiq[..., 0]
    i = yiq[..., 1] * cos[:, None, None] - yiq[..., 2] * sin[:, None, None]
    q = yiq[..., 1] * sin[:, None, None] + yiq[..., 2] * cos[:, None, None]
    out = jnp.einsum("bhwd,cd->bhwc", jnp.stack([y, i, q], -1), jnp.asarray(_YIQ2RGB))
    return jnp.clip(out, 0.0, 1.0)


def _blend(a, b, factor):
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


# ---------------------------------------------------------------------------
# crop-box sampling (torchvision RandomResizedCrop.get_params), batched


def sample_crop_boxes(rng, batch: int, in_h: int, in_w: int, cfg: AugmentConfig):
    """10-attempt rejection sampling, vectorized over batch AND attempts.
    Returns (i, j, h, w) arrays [B] float32."""
    area = float(in_h * in_w)
    k_scale, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    target_area = area * jax.random.uniform(
        k_scale, (batch, 10), minval=cfg.crop_scale[0], maxval=cfg.crop_scale[1]
    )
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, (batch, 10),
            minval=jnp.log(cfg.crop_ratio[0]), maxval=jnp.log(cfg.crop_ratio[1]),
        )
    )
    w = jnp.round(jnp.sqrt(target_area * aspect))
    h = jnp.round(jnp.sqrt(target_area / aspect))
    valid = (w > 0) & (w <= in_w) & (h > 0) & (h <= in_h)
    first = jnp.argmax(valid, axis=1)  # first valid attempt per sample
    any_valid = jnp.any(valid, axis=1)
    take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
    sel_h, sel_w = take(h), take(w)
    u_i = take(jax.random.uniform(k_i, (batch, 10)))
    u_j = take(jax.random.uniform(k_j, (batch, 10)))
    i = jnp.floor(u_i * (in_h - sel_h + 1))
    j = jnp.floor(u_j * (in_w - sel_w + 1))
    # center fallback clamped to ratio range (torchvision semantics)
    in_ratio = in_w / in_h
    fb_w = jnp.where(
        in_ratio < cfg.crop_ratio[0], float(in_w),
        jnp.where(in_ratio > cfg.crop_ratio[1], round(in_h * cfg.crop_ratio[1]), float(in_w)),
    )
    fb_h = jnp.where(
        in_ratio < cfg.crop_ratio[0], round(in_w / cfg.crop_ratio[0]), float(in_h)
    )
    fb_i, fb_j = (in_h - fb_h) // 2, (in_w - fb_w) // 2
    return (
        jnp.where(any_valid, i, fb_i).astype(jnp.float32),
        jnp.where(any_valid, j, fb_j).astype(jnp.float32),
        jnp.where(any_valid, sel_h, fb_h).astype(jnp.float32),
        jnp.where(any_valid, sel_w, fb_w).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# separable linear operators (the MXU path)


def _bilinear_matrix(start, size, in_dim: int, out_dim: int, flip=None):
    """Per-sample bilinear sampling operators W [B, out_dim, in_dim]:
    (W · v)[i] = v sampled at start + (i + .5)·size/out − .5, edge-clamped.
    ``flip`` [B] bool reverses the output coordinate order (free hflip)."""
    idx_out = jnp.arange(out_dim, dtype=jnp.float32)
    if flip is not None:
        idx_out = jnp.where(flip[:, None], out_dim - 1.0 - idx_out[None, :], idx_out[None, :])
    else:
        idx_out = jnp.broadcast_to(idx_out[None, :], (start.shape[0], out_dim))
    scale = size[:, None] / out_dim  # [B, 1]
    src = start[:, None] + (idx_out + 0.5) * scale - 0.5  # [B, out]
    src = jnp.clip(src, 0.0, in_dim - 1.0)
    j = jnp.arange(in_dim, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - j[None, None, :]))
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)


def _gaussian_matrix(sigma, apply_mask, dim: int, kernel: int):
    """Per-sample truncated-gaussian Toeplitz operators G [B, dim, dim];
    identity where ``apply_mask`` is False."""
    half = (kernel - 1) // 2
    idx = jnp.arange(dim, dtype=jnp.float32)
    d = idx[:, None] - idx[None, :]  # [dim, dim]
    g = jnp.exp(-0.5 * (d[None, :, :] / sigma[:, None, None]) ** 2)
    g = jnp.where(jnp.abs(d)[None] <= half, g, 0.0)
    g = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-8)
    eye = jnp.eye(dim)[None]
    return jnp.where(apply_mask[:, None, None], g, eye)


def _apply_separable(img, w_y, w_x):
    """img [B,H,W,C] · per-sample operators → [B,out_h,out_w,C] on the MXU."""
    out = jnp.einsum("bij,bjwc->biwc", w_y, img, preferred_element_type=jnp.float32)
    return jnp.einsum("bkw,bhwc->bhkc", w_x, out, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# batched color jitter


def _adjust_hue_hsv(img, shift):
    """Exact HSV hue shift (torchvision F.adjust_hue float-tensor semantics):
    h ← (h + shift) mod 1. img [B,H,W,3] in [0,1], shift [B] in [-0.5, 0.5]."""
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + shift[:, None, None]) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter_apply(img, perm, fb, fc, fs, fh, cfg: AugmentConfig):
    """Apply the four jitter ops in per-sample random order (torchvision
    ColorJitter semantics: ``fn_idx = randperm(4)`` per call, factors drawn
    upfront — reference ``transforms.py:68``).

    img [B,H,W,3] in [0,1]; perm [B,4] permutations of (0,1,2,3);
    fb/fc/fs [B] blend factors (1.0 = identity); fh [B] hue shift in turns
    (0.0 = identity). Deterministic given its arguments — the parameter draws
    live in the caller, so the numpy oracle test can inject identical params.

    Cost shape: the three blend ops are 1–2 fused elementwise passes per
    stage (contrast's per-image grayscale mean is the one small reduction).
    The HSV hue round trip — by far the heaviest op — is evaluated exactly
    ONCE: every permutation contains op 3 exactly once, so the composition
    splits into (blend ops at stages before hue) → hue → (blend ops after).
    Statically disabled ops (strength 0 in cfg) contribute identity without
    cost."""

    def blend_stages(img, active, stages):
        # Each stage applies AT MOST ONE of the three blend ops per sample,
        # and every blend op is the channel-affine map
        #   out = clip(a·img + b·gray(img) + c·mean(gray(img)))
        # (brightness: a=f; contrast: a=f, c=1−f; saturation: a=f, b=1−f;
        # identity: a=1). Selecting [B]-scalar coefficients instead of
        # selecting between full candidate tensors keeps every stage ONE
        # fused elementwise pass + a (epilogue-fusable) mean reduction —
        # the tensor-select form measured ~3 ms/step slower at b=128@224.
        if not (cfg.brightness or cfg.contrast or cfg.saturation):
            return img
        for t in stages:
            op = perm[:, t]
            on = active(t)
            a = jnp.ones_like(fb)
            bg = jnp.zeros_like(fb)
            cm = jnp.zeros_like(fb)
            if cfg.brightness:
                a = jnp.where((op == 0) & on, fb, a)
            if cfg.contrast:
                sel = (op == 1) & on
                a = jnp.where(sel, fc, a)
                cm = jnp.where(sel, 1.0 - fc, cm)
            if cfg.saturation:
                sel = (op == 2) & on
                a = jnp.where(sel, fs, a)
                bg = jnp.where(sel, 1.0 - fs, bg)
            gray = (_rgb_to_grayscale(img)
                    if (cfg.contrast or cfg.saturation) else None)  # [B,H,W,1]
            out = a[:, None, None, None] * img
            if cfg.saturation:
                out = out + bg[:, None, None, None] * gray
            if cfg.contrast:
                mean = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
                out = out + cm[:, None, None, None] * mean
            img = jnp.clip(out, 0.0, 1.0)
        return img

    if not cfg.hue:
        every = jnp.ones((img.shape[0],), bool)
        return blend_stages(img, lambda t: every, range(4))
    h_pos = jnp.argmax(perm == 3, axis=1)  # [B] — hue's stage per sample
    # stage 3 can never be before hue (h_pos ≤ 3) and stage 0 never after —
    # 3+3 live stages, not 4+4
    img = blend_stages(img, lambda t: t < h_pos, range(3))
    img = _adjust_hue_hsv(img, fh)
    return blend_stages(img, lambda t: t > h_pos, range(1, 4))


def _color_jitter_batch(rng, img, cfg: AugmentConfig, group_size: int = 1, draw=None):
    b = img.shape[0]
    groups = b // group_size
    keys = jax.random.split(rng, 9)

    if draw is None:
        def draw(key, **kw):
            v = jax.random.uniform(key, (groups,), **kw)
            return jnp.repeat(v, group_size) if group_size > 1 else v

    apply = draw(keys[0]) < cfg.color_jitter_prob

    if cfg.jitter_order == "fixed":
        # round-1 fast path: fixed b→c→s→hue order, YIQ-plane hue rotation
        def factor(key, strength):
            f = draw(key, minval=1.0 - strength, maxval=1.0 + strength)
            return jnp.where(apply, f, 1.0)[:, None, None, None]

        if cfg.brightness:
            img = _blend(img, jnp.zeros_like(img), factor(keys[1], cfg.brightness))
        if cfg.contrast:
            mean = jnp.mean(_rgb_to_grayscale(img), axis=(1, 2, 3), keepdims=True)
            img = _blend(img, jnp.broadcast_to(mean, img.shape), factor(keys[2], cfg.contrast))
        if cfg.saturation:
            gray = jnp.broadcast_to(_rgb_to_grayscale(img), img.shape)
            img = _blend(img, gray, factor(keys[3], cfg.saturation))
        if cfg.hue:
            shift = draw(keys[4], minval=-cfg.hue, maxval=cfg.hue)
            img = _hue_rotate(img, jnp.where(apply, shift, 0.0))
        return img

    assert cfg.jitter_order == "torchvision", cfg.jitter_order
    ones = jnp.ones_like(apply, jnp.float32)

    def factor(key, strength):
        f = draw(key, minval=max(0.0, 1.0 - strength), maxval=1.0 + strength)
        return jnp.where(apply, f, 1.0)

    fb = factor(keys[1], cfg.brightness) if cfg.brightness else ones
    fc = factor(keys[2], cfg.contrast) if cfg.contrast else ones
    fs = factor(keys[3], cfg.saturation) if cfg.saturation else ones
    if cfg.hue:
        fh = jnp.where(apply, draw(keys[4], minval=-cfg.hue, maxval=cfg.hue), 0.0)
    else:
        fh = jnp.zeros_like(ones)
    # per-sample uniformly random op order via argsort of iid uniforms
    # (= torchvision's randperm(4) per call), globally keyed like every
    # other parameter draw
    u = jnp.stack([draw(keys[5 + i]) for i in range(4)], axis=1)
    perm = jnp.argsort(u, axis=1).astype(jnp.int32)
    out = color_jitter_apply(img, perm, fb, fc, fs, fh, cfg)
    # exact identity for non-applied samples (the hue stage's HSV round
    # trip at shift 0 is identity only up to float error)
    return jnp.where(apply[:, None, None, None], out, img)


def _finalize(out, cfg: AugmentConfig):
    if cfg.normalize:
        mean = jnp.asarray(IMAGENET_MEAN, out.dtype)
        std = jnp.asarray(IMAGENET_STD, out.dtype)
        out = (out - mean) / std
    return out


def augment_batch(
    rng: jax.Array,
    images: jax.Array,
    cfg: AugmentConfig,
    train: bool = True,
    dtype=jnp.float32,
    group_size: int = 1,
    global_batch: int = None,
    row_offset=0,
) -> jax.Array:
    """Fused batched augmentation. images: [B, H, W, 3] uint8 (or unit float).

    Per-sample independent randomness via one rng (all parameter draws are
    [B]-shaped); pass the *same* rng to two calls to reproduce the reference's
    ``shared_transform`` re-seeding (``r2v2_dataset.py:81-83``).
    ``group_size=T`` shares one augmentation across each run of T consecutive
    frames (the Kinetics clip semantics, ``kinetics_400_dataset.py:73-92``).

    ``global_batch``/``row_offset`` make the randomness **mesh-invariant**:
    parameter draws are made at the global batch size (cheap — all draws are
    [B]-vectors) and each device slices its rows, so sample i's augmentation
    is a function of (rng, i) alone, independent of how the batch is sharded.
    ``row_offset`` may be a traced value (``d_idx * b_local``).
    """
    imgs = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        imgs = imgs / 255.0
    if not train:
        out = val_resize_center_crop(imgs, cfg.size)
        return _finalize(out, cfg).astype(dtype)

    b, in_h, in_w, _ = imgs.shape
    assert b % group_size == 0, (b, group_size)
    groups = b // group_size
    if global_batch is None:
        g_groups, g_off = groups, None
    else:
        assert global_batch % group_size == 0, (global_batch, group_size)
        g_groups = global_batch // group_size
        g_off = row_offset // group_size

    def _slice(v):
        if g_off is None:
            return v
        return jax.lax.dynamic_slice_in_dim(v, g_off, groups, axis=0)

    def draw(key, *a, **kw):
        v = _slice(jax.random.uniform(key, (g_groups,), *a, **kw))
        return jnp.repeat(v, group_size) if group_size > 1 else v

    keys = jax.random.split(rng, 6)
    # crop boxes (grouped: same box across a clip's frames)
    gi, gj, gh, gw = (
        _slice(v) for v in sample_crop_boxes(keys[0], g_groups, in_h, in_w, cfg)
    )
    if group_size > 1:
        gi, gj, gh, gw = (jnp.repeat(v, group_size) for v in (gi, gj, gh, gw))
    flip = draw(keys[1]) < cfg.hflip_prob

    out_h, out_w = cfg.size
    w_y = _bilinear_matrix(gi, gh, in_h, out_h)
    w_x = _bilinear_matrix(gj, gw, in_w, out_w, flip=flip)
    out = _apply_separable(imgs, w_y, w_x)
    out = jnp.clip(out, 0.0, 1.0)

    if cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue:
        out = _color_jitter_batch(keys[2], out, cfg, group_size=group_size, draw=draw)
    if cfg.grayscale_prob > 0:
        do_gray = draw(keys[3]) < cfg.grayscale_prob
        gray = jnp.broadcast_to(_rgb_to_grayscale(out), out.shape)
        out = jnp.where(do_gray[:, None, None, None], gray, out)
    if cfg.blur_prob > 0:
        do_blur = draw(keys[4]) < cfg.blur_prob
        sigma = draw(keys[5], minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
        g_y = _gaussian_matrix(sigma, do_blur, out_h, cfg.blur_kernel)
        g_x = _gaussian_matrix(sigma, do_blur, out_w, cfg.blur_kernel)
        out = _apply_separable(out, g_y, g_x)
    return _finalize(out, cfg).astype(dtype)


def val_resize_center_crop(images: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Resize to size/0.875 then center crop (reference transforms.py:77-86)."""
    rh, rw = int(size[0] / 0.875), int(size[1] / 0.875)
    resized = jax.image.resize(
        images, (images.shape[0], rh, rw, images.shape[-1]), method="linear"
    )
    i, j = (rh - size[0]) // 2, (rw - size[1]) // 2
    return resized[:, i : i + size[0], j : j + size[1]]
