"""Fused Pallas [affine → ReLU → 3×3 conv → batch-stat sums] kernel.

The BN barrier a 3×3 conv leaves behind (derived-stat folding only works for
1×1 convs — see ``models/resnet.py::folded_dot_bn``) costs three extra HBM
traversals per conv in the reference-equivalent XLA path:

    normalize pass:  read y_prev, write x̂         (BN-apply + ReLU)
    conv:            read x̂,     write y
    stat pass:       read y                        (Σy, Σy² for the next BN)

This kernel computes ``y = conv3×3(relu(y_prev·a + b))`` and the per-channel
sums ``(Σy, Σy²)`` in ONE pass over y_prev: x̂ never exists in HBM and y is
never re-read. Supported: stride 1, dilation 1, C % 128 == 0, H ≤ 32
(ResNet stages 2–4). Backward is exact: a ``jax.custom_vjp`` whose transpose
convs come from ``jax.linear_transpose`` of the same conv — no forward
recompute; the (Σy, Σy²) cotangents fold into the output cotangent
elementwise (∂Σy/∂y = 1, ∂Σy²/∂y = 2y).

**STATUS: experimental — numerically validated, NOT integrated.** Measured on
a real v5e at the R50 stage-2 shape ([128,28,28,128]→128), the fused chain is
SLOWER than the three-pass XLA path it replaces (0.78–0.84 ms vs 0.44 ms per
conv site), in both formulations tried:
  - im2col-in-VMEM single K=9C dot: the column-tile materialization moves
    more VMEM bandwidth than the matmul itself;
  - 9 accumulated K=C dots on shifted slices: Mosaic lowers each pad/shift
    tap as a full masked copy of the band.
XLA:TPU's internal conv emitter runs this shape ~2× faster than either
Pallas lowering, and the fusion's HBM saving (3 traversals ≈ 0.1 ms at
stage-2 sizes) is smaller than that compute gap — so conv+BN fusion is a
net loss until Pallas can match the native conv pipeline. Kept (with exact
VJP + parity tests) as the starting point if that changes; see
docs/PERFORMANCE.md "Failed experiment: Pallas conv3×3+stats fusion".

Reference semantics: BatchNorm-apply + ReLU + conv of
``models/building_blocks/resnet.py:53-137``; the stat sums are what flax
BatchNorm reduces for the *following* norm layer.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # importable on CPU for interpret mode
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _conv_nhwc(x, kernel):
    return lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _reference(y_prev, a, b, kernel):
    """Same math in plain XLA (non-TPU backends, parity tests, fallbacks).
    Uses jax.nn.relu, whose derivative is 0 at exactly 0 — matching the
    custom VJP's strict (x̂ > 0) mask (jnp.maximum would split ties 0.5/0.5,
    and exact zeros are common when the input is already post-ReLU)."""
    dtype = y_prev.dtype
    xh = jax.nn.relu(y_prev.astype(jnp.float32) * a + b).astype(dtype)
    y = _conv_nhwc(xh, kernel.astype(dtype))
    s1 = jnp.sum(y, axis=(0, 1, 2), dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2))
    return y, s1, s2


def _pick_nb(n: int, h: int, w: int, c: int) -> int:
    """Images per grid step: enough rows to feed the MXU (M = nb·H·W ≈ 2k)
    while the [nb, H, W, 9C] im2col tile stays ≲ 4 MB of VMEM."""
    nb = 1
    while (
        nb * 2 <= n
        and n % (nb * 2) == 0
        and nb * 2 * h * w <= 4096
        and nb * 2 * h * w * 9 * c * 2 <= 4 * 1024 * 1024
    ):
        nb *= 2
    return nb


def _hshift(x, kx):
    """Horizontal tap on [nb, H, W, C]: column w reads x[w+kx-1], zero edges."""
    if kx == 0:
        return jnp.pad(x[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    if kx == 2:
        return jnp.pad(x[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return x


def _kernel(y_ref, a_ref, b_ref, k_ref, out_ref, s1_ref, s2_ref,
            *, h, c, dtype):
    a = a_ref[0, :]
    b = b_ref[0, :]
    xh = jnp.maximum(y_ref[...].astype(jnp.float32) * a + b, 0.0).astype(dtype)
    # vertical conv zero-padding as a value op (full-height blocks: H ≤ 32
    # for every supported stage, so no halo plumbing is needed at all)
    ext = jnp.pad(xh, ((0, 0), (1, 1), (0, 0), (0, 0)))  # [nb, H+2, W, C]

    # 9 accumulated K=C dots (full 128-lane fill at C,F ≥ 128); no im2col
    # scratch — materializing the [nb,H,W,9C] column tile costs more VMEM
    # bandwidth than the matmul itself
    out = None
    for ky in range(3):
        rows = ext[:, ky:ky + h]
        for kx in range(3):
            off = (ky * 3 + kx) * c
            part = lax.dot_general(
                _hshift(rows, kx), k_ref[off:off + c, :],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nb, H, W, F] f32
            out = part if out is None else out + part
    out_b = out.astype(dtype)
    out_ref[...] = out_b
    # stats describe the STORED (rounded) tensor, matching _reference — the
    # downstream BN normalizes the stored y, not the f32 accumulator
    out = out_b.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[0, :] += jnp.sum(out, axis=(0, 1, 2))
    s2_ref[0, :] += jnp.sum(out * out, axis=(0, 1, 2))


def _pallas_impl(y_prev, a, b, kernel, interpret=False):
    n, h, w, c = y_prev.shape
    f = kernel.shape[-1]
    dtype = y_prev.dtype
    nb = _pick_nb(n, h, w, c)
    kmat = kernel.astype(dtype).reshape(9 * c, f)
    grid = (n // nb,)
    kern = functools.partial(_kernel, h=h, c=c, dtype=dtype)
    y, s1, s2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda ni: (ni, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda ni: (0, 0)),
            pl.BlockSpec((1, c), lambda ni: (0, 0)),
            pl.BlockSpec((9 * c, f), lambda ni: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, h, w, f), lambda ni: (ni, 0, 0, 0)),
            pl.BlockSpec((1, f), lambda ni: (0, 0)),  # resident accumulators
            pl.BlockSpec((1, f), lambda ni: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, f), dtype),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        interpret=interpret,
    )(y_prev,
      a.reshape(1, c).astype(jnp.float32),
      b.reshape(1, c).astype(jnp.float32), kmat)
    return y, s1[0], s2[0]


def kernel_supported(y_prev, kernel, stride=(1, 1), dilation=(1, 1)) -> bool:
    """True iff the Pallas path can produce correct results for this site.
    The kernel ONLY implements stride-1 / dilation-1 3x3 convs (pad 1) —
    integrators must pass the site's stride/dilation so unsupported sites
    fall back to XLA instead of silently computing the wrong conv."""
    n, h, w, c = y_prev.shape
    return (
        pltpu is not None
        and tuple(stride) == (1, 1)
        and tuple(dilation) == (1, 1)
        and c % 128 == 0
        and kernel.shape[:3] == (3, 3, c)
        and 2 <= h <= 32
        and h * w * 9 * c * 2 <= 4 * 1024 * 1024
    )


# tri-state override for dispatch: None = auto (default backend is a TPU),
# True/False force the Pallas / XLA path. The auto check looks at the process
# default backend, NOT the device the call is staged on — a caller jitting
# onto CPU devices while a TPU is attached must set this to False.
USE_PALLAS = None


def _use_pallas(y_prev, kernel, use_pallas):
    if not kernel_supported(y_prev, kernel):
        return False
    if use_pallas is not None:
        return use_pallas
    if USE_PALLAS is not None:
        return USE_PALLAS
    return jax.default_backend() in ("tpu", "axon")


def _fwd_impl(y_prev, a, b, kernel, use_pallas=None):
    if not _use_pallas(y_prev, kernel, use_pallas):
        return _reference(y_prev, a, b, kernel)
    return _pallas_impl(y_prev, a, b, kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def affine_conv3x3_stats(
    y_prev: jax.Array, a: jax.Array, b: jax.Array, kernel: jax.Array,
    use_pallas=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(y, Σy, Σy²) with y = conv3×3(relu(y_prev·a + b)), stride 1, pad 1.

    y_prev: [N,H,W,C] (compute dtype); a, b: [C] f32 (the folded BN of the
    *input*: a = γ·rsqrt(var+ε), b = β − μ·a; identity affine a=1, b=0 when
    the input is already activated); kernel: [3,3,C,F] f32.

    ``use_pallas``: explicit per-call Pallas/XLA choice — part of the jit
    cache key (a nondiff argnum), unlike the legacy module-global USE_PALLAS
    latch which is only read at trace time. None = auto (global, then
    default-backend sniff).
    """
    return _fwd_impl(y_prev, a, b, kernel, use_pallas)


def _vjp_fwd(y_prev, a, b, kernel, use_pallas=None):
    y, s1, s2 = _fwd_impl(y_prev, a, b, kernel, use_pallas)
    return (y, s1, s2), (y_prev, a, b, kernel, y)


def _vjp_bwd(use_pallas, residuals, cotangents):
    y_prev, a, b, kernel, y = residuals
    gy, gs1, gs2 = cotangents
    dtype = y_prev.dtype
    kb = kernel.astype(dtype)
    # stat cotangents fold into the output cotangent: ∂Σy/∂y=1, ∂Σy²/∂y=2y
    g = (gy.astype(jnp.float32) + gs1.astype(jnp.float32)
         + 2.0 * y.astype(jnp.float32) * gs2.astype(jnp.float32)).astype(dtype)
    xh_f32 = jnp.maximum(y_prev.astype(jnp.float32) * a + b, 0.0)
    xh = xh_f32.astype(dtype)
    # transpose convs of the SAME linear maps — no forward recompute
    (dxh,) = jax.linear_transpose(lambda v: _conv_nhwc(v, kb), xh)(g)
    (dk,) = jax.linear_transpose(lambda k: _conv_nhwc(xh, k), kb)(g)
    t = dxh.astype(jnp.float32) * (xh_f32 > 0.0)
    dy_prev = (t * a).astype(y_prev.dtype)
    da = jnp.sum(t * y_prev.astype(jnp.float32), axis=(0, 1, 2))
    db = jnp.sum(t, axis=(0, 1, 2))
    return dy_prev, da, db, dk.astype(kernel.dtype)


affine_conv3x3_stats.defvjp(_vjp_fwd, _vjp_bwd)
