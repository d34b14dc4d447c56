"""On-device fused image augmentation (XLA, batched, per-sample RNG).

This replaces the reference's host-side PIL pipeline (``utils/transforms.py``)
— the dataloader→GPU hot path that BASELINE.json's north star moves on-device.
Every op is expressed as batched XLA (vmap over per-sample fold-in keys) so the
whole chain fuses into a handful of kernels feeding the encoder directly from
uint8 HBM buffers; there is no host augmentation cost and no PCIe-sized float
transfer.

Behavioral parity targets (parameter distributions, not pixel-exact PIL
reproduction — documented deviation: bilinear resampling is XLA
``scale_and_translate`` with antialiasing, PIL-equivalent up to interpolation
kernel details):

  - RandomResizedCrop: torchvision semantics — area ~ U(scale)·A, aspect ~
    exp(U(log ratio)), 10 rejection-sampling attempts then center-crop
    fallback (reference uses scale=(0.2,1), ratio=(0.7,1.4) for images,
    ``transforms.py:67``; various scales per pipeline).
  - ColorJitter(brightness, contrast, saturation, hue) in random order
    (``transforms.py:68``), RandomGrayscale(p) (``:70``),
    RandomHorizontalFlip (``:71``), Normalize (``:73``).
  - RandomGaussianBlur: kernel = size//10, sigma ~ U(0.1, 2.0), applied with
    probability p (reference ``util_functions.py:104-132``,
    ``transforms.py:115``). Separable depthwise conv → two VPU passes.
  - Val path: resize(size/0.875) + center crop + normalize
    (``transforms.py:77-86``).

Transform *pipelines* (named configs matching ``transforms.__all__``) live in
``vince_tpu.utils.transforms``.
"""

import dataclasses
from typing import Optional, Tuple

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

    @property
    def blur_kernel(self) -> int:
        k = max(self.size[0] // 10, 3)
        return k + 1 - (k % 2)  # odd


# ---------------------------------------------------------------------------
# color helpers


def _rgb_to_grayscale(img):
    # ITU-R 601-2 luma (PIL convert("L") weights, used by torchvision)
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    g = jnp.tensordot(img, w, axes=([-1], [0]))
    return g[..., None]


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
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
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
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _blend(a, b, factor):
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


# ---------------------------------------------------------------------------
# single-image ops (unit-range float32 [H, W, 3]); vmapped by augment_batch


def _apply_brightness(rng, img, strength):
    f = jax.random.uniform(rng, (), minval=1.0 - strength, maxval=1.0 + strength)
    return _blend(img, jnp.zeros_like(img), f)


def _apply_contrast(rng, img, strength):
    f = jax.random.uniform(rng, (), minval=1.0 - strength, maxval=1.0 + strength)
    mean = jnp.mean(_rgb_to_grayscale(img))
    return _blend(img, jnp.full_like(img, mean), f)


def _apply_saturation(rng, img, strength):
    f = jax.random.uniform(rng, (), minval=1.0 - strength, maxval=1.0 + strength)
    return _blend(img, jnp.broadcast_to(_rgb_to_grayscale(img), img.shape), f)


def _apply_hue(rng, img, strength):
    shift = jax.random.uniform(rng, (), minval=-strength, maxval=strength)
    hsv = _rgb_to_hsv(img)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return _hsv_to_rgb(hsv)


def _color_jitter(rng, img, cfg: AugmentConfig):
    """torchvision ColorJitter: the four ops in random order."""
    order_rng, b_rng, c_rng, s_rng, h_rng = jax.random.split(rng, 5)
    order = jax.random.permutation(order_rng, 4)
    ops = (
        lambda im: _apply_brightness(b_rng, im, cfg.brightness) if cfg.brightness else im,
        lambda im: _apply_contrast(c_rng, im, cfg.contrast) if cfg.contrast else im,
        lambda im: _apply_saturation(s_rng, im, cfg.saturation) if cfg.saturation else im,
        lambda im: _apply_hue(h_rng, im, cfg.hue) if cfg.hue else im,
    )

    def body(k, im):
        return jax.lax.switch(order[k], ops, im)

    return jax.lax.fori_loop(0, 4, body, img)


def _sample_crop_box(rng, in_h, in_w, cfg: AugmentConfig):
    """torchvision RandomResizedCrop.get_params: 10 attempts, vectorized —
    sample all 10 candidates, take the first valid, else center fallback."""
    area = in_h * in_w
    k_scale, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    target_area = area * jax.random.uniform(
        k_scale, (10,), minval=cfg.crop_scale[0], maxval=cfg.crop_scale[1]
    )
    log_ratio = jax.random.uniform(
        k_ratio,
        (10,),
        minval=jnp.log(cfg.crop_ratio[0]),
        maxval=jnp.log(cfg.crop_ratio[1]),
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    h = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (w > 0) & (w <= in_w) & (h > 0) & (h <= in_h)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # first True (argmax of bool picks first max)
    # uniform offsets for the selected candidate
    u_i = jax.random.uniform(k_i, (10,))
    u_j = jax.random.uniform(k_j, (10,))
    sel_h, sel_w = h[first], w[first]
    i = jnp.floor(u_i[first] * (in_h - sel_h + 1)).astype(jnp.int32)
    j = jnp.floor(u_j[first] * (in_w - sel_w + 1)).astype(jnp.int32)
    # center-crop fallback clamped to the ratio range (torchvision semantics)
    in_ratio = in_w / in_h
    fb_w = jnp.where(
        in_ratio < cfg.crop_ratio[0],
        in_w,
        jnp.where(in_ratio > cfg.crop_ratio[1], jnp.int32(round(in_h * cfg.crop_ratio[1])), in_w),
    )
    fb_h = jnp.where(
        in_ratio < cfg.crop_ratio[0],
        jnp.int32(round(in_w / cfg.crop_ratio[0])),
        jnp.where(in_ratio > cfg.crop_ratio[1], in_h, in_h),
    )
    fb_i = (in_h - fb_h) // 2
    fb_j = (in_w - fb_w) // 2
    return (
        jnp.where(any_valid, i, fb_i),
        jnp.where(any_valid, j, fb_j),
        jnp.where(any_valid, sel_h, fb_h),
        jnp.where(any_valid, sel_w, fb_w),
    )


def _crop_and_resize(img, box, out_size):
    """Resize img[i:i+h, j:j+w] → out_size with bilinear scale_and_translate
    (static output shape; dynamic box via scale/translation — jit-safe)."""
    i, j, h, w = box
    out_h, out_w = out_size
    scale_y = out_h / h.astype(jnp.float32)
    scale_x = out_w / w.astype(jnp.float32)
    translation_y = -i.astype(jnp.float32) * scale_y
    translation_x = -j.astype(jnp.float32) * scale_x
    return jax.image.scale_and_translate(
        img,
        (out_h, out_w, img.shape[-1]),
        (0, 1),
        jnp.stack([scale_y, scale_x]),
        jnp.stack([translation_y, translation_x]),
        method="linear",
        antialias=True,
    )


def _gaussian_blur(rng, img, cfg: AugmentConfig):
    """Separable gaussian, per-image sigma ~ U(blur_sigma) — reference
    util_functions.py:104-132 (two conv passes)."""
    k = cfg.blur_kernel
    sigma = jax.random.uniform(rng, (), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    half = (k - 1) // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = w / jnp.sum(w)
    # [H, W, C] → two 1D convs along H then W (depthwise)
    img_t = img.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    kern_h = w.reshape(1, 1, k, 1)
    kern_w = w.reshape(1, 1, 1, k)
    out = jax.lax.conv_general_dilated(img_t, kern_h, (1, 1), [(half, half), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kern_w, (1, 1), [(0, 0), (half, half)])
    return out[:, 0].transpose(1, 2, 0)


def _augment_one(rng, img_f32, cfg: AugmentConfig):
    """Full train-time chain on one [H, W, 3] unit-range image."""
    keys = jax.random.split(rng, 8)
    box = _sample_crop_box(keys[0], img_f32.shape[0], img_f32.shape[1], cfg)
    out = _crop_and_resize(img_f32, box, cfg.size)
    out = jnp.clip(out, 0.0, 1.0)
    if cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue:
        do_jitter = jax.random.uniform(keys[1]) < cfg.color_jitter_prob
        out = jax.lax.cond(do_jitter, lambda im: _color_jitter(keys[2], im, cfg), lambda im: im, out)
    if cfg.grayscale_prob > 0:
        do_gray = jax.random.uniform(keys[3]) < cfg.grayscale_prob
        gray = jnp.broadcast_to(_rgb_to_grayscale(out), out.shape)
        out = jnp.where(do_gray, gray, out)
    if cfg.hflip_prob > 0:
        do_flip = jax.random.uniform(keys[4]) < cfg.hflip_prob
        out = jnp.where(do_flip, out[:, ::-1], out)
    if cfg.blur_prob > 0:
        do_blur = jax.random.uniform(keys[5]) < cfg.blur_prob
        out = jax.lax.cond(
            do_blur, lambda im: _gaussian_blur(keys[6], im, cfg), lambda im: im, out
        )
    return out


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
) -> jax.Array:
    """Fused batched augmentation. images: [B, H, W, 3] uint8 (or unit float).

    Per-sample independent randomness via key splitting; pass the *same* rng to
    two calls to reproduce the reference's ``shared_transform`` re-seeding
    (``r2v2_dataset.py:81-83``). ``group_size=T`` shares one augmentation
    across each run of T consecutive frames (the Kinetics clip semantics,
    reference ``kinetics_400_dataset.py:73-92``).
    """
    if images.dtype == jnp.uint8:
        imgs = images.astype(jnp.float32) / 255.0
    else:
        imgs = images.astype(jnp.float32)
    if train:
        b = images.shape[0]
        assert b % group_size == 0, (b, group_size)
        keys = jax.random.split(rng, b // group_size)
        if group_size > 1:
            keys = jnp.repeat(keys, group_size, axis=0)
        out = jax.vmap(lambda k, im: _augment_one(k, im, cfg))(keys, imgs)
    else:
        out = val_resize_center_crop(imgs, cfg.size)
    return _finalize(out, cfg).astype(dtype)


def val_resize_center_crop(images: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Resize to size/0.875 then center crop (reference transforms.py:77-86)."""
    rh, rw = int(size[0] / 0.875), int(size[1] / 0.875)
    resized = jax.image.resize(
        images, (images.shape[0], rh, rw, images.shape[-1]), method="linear"
    )
    i, j = (rh - size[0]) // 2, (rw - size[1]) // 2
    return resized[:, i : i + size[0], j : j + size[1]]
