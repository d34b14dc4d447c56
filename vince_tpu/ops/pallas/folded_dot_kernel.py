"""Fused [BN-apply + ReLU + 1×1-dot + moment-accumulation] Pallas kernel.

The derived-stat BN folding (``models/resnet.py::folded_dot_bn``) turns every
bottleneck conv3/downsample into a *dot* whose input moments (Σx, xᵀx) derive
the next BN's batch statistics. On TPU, XLA fuses elementwise producers into
**convolutions** but not into **dots** — so the path

    x̂ = relu(a·y + b)        (bn2 apply + ReLU;   multiply_add pass: write x̂)
    s1 = Σ x̂,  s2 = x̂ᵀx̂      (moment reads of x̂)
    out = x̂ @ W              (main dot read of x̂)

materializes x̂ in HBM and reads it twice more. This kernel computes all four
tensors in ONE pass over ``y`` held in VMEM tiles: per row-block, apply the
affine+ReLU in registers, run the main dot and the moment dot on the MXU, and
accumulate s1/s2 across the grid — x̂ never exists in HBM.

    affine_relu_dot_moments(y [M,C], a [C], b [C], w [C,F])
        -> (out [M,F] compute-dtype, s1 [C] f32, s2 [C,C] f32)

Backward is a ``jax.custom_vjp`` in plain XLA (one recompute of x̂ fused into
the transpose convs); see ``_vjp_bwd``. A pure-XLA ``_reference`` carries the
semantics on CPU and in parity tests.

Supported: C and F multiples of 128 (lane width), M multiple of the row block
(callers pad M or pick shapes that divide; ResNet stage-2..4 shapes all do).
Dispatch mirrors ``conv_bn_kernel``: explicit ``use_pallas`` nondiff argument
(part of the jit cache key), default auto = TPU backend.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

MAX_BLOCK_ROWS = 1024


def _block_rows(m: int) -> int:
    """Largest power-of-two divisor of m, capped at MAX_BLOCK_ROWS (R50 stage
    row counts are 2^k·49, so this yields 1024/512/128 for stages 2/3/4)."""
    b = m & -m  # largest power-of-2 divisor
    return min(b, MAX_BLOCK_ROWS)


def _reference(y, a, b, w):
    xh32 = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0)
    xh = xh32.astype(y.dtype)
    out = jnp.dot(xh, w.astype(y.dtype))
    s1 = jnp.sum(xh32, axis=0)
    s2 = jax.lax.dot_general(
        xh, xh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out, s1, s2


def _kernel(y_ref, a_ref, b_ref, w_ref, out_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    y = y_ref[:]  # [bm, C] compute dtype
    a = a_ref[:]  # [1, C] f32
    b = b_ref[:]  # [1, C] f32
    xh32 = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0)
    xh = xh32.astype(y.dtype)
    out_ref[:] = jnp.dot(
        xh, w_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += jnp.sum(xh32, axis=0, keepdims=True)
    s2_ref[:] += jax.lax.dot_general(
        xh, xh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def kernel_supported(y, w) -> bool:
    m, c = y.shape
    f = w.shape[-1]
    return (
        pltpu is not None
        and c % 128 == 0
        and f % 128 == 0
        and m % 128 == 0
    )


def _pallas_impl(y, a, b, w):
    m, c = y.shape
    f = w.shape[-1]
    bm = _block_rows(m)
    grid = (m // bm,)
    out, s1, s2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, f), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, f), y.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
    )(y, a.reshape(1, c).astype(jnp.float32), b.reshape(1, c).astype(jnp.float32),
      w.astype(y.dtype))
    return out, s1[0], s2


def _use_pallas(y, w, use_pallas):
    if not kernel_supported(y, w):
        return False
    if use_pallas is not None:
        return use_pallas
    return jax.default_backend() in ("tpu", "axon")


def _fwd_impl(y, a, b, w, use_pallas=None):
    if not _use_pallas(y, w, use_pallas):
        return _reference(y, a, b, w.astype(y.dtype))
    return _pallas_impl(y, a, b, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def affine_relu_dot_moments(
    y: jax.Array,  # [M, C] compute dtype (bf16/f32)
    a: jax.Array,  # [C] f32 — input-BN fold scale (identity: ones)
    b: jax.Array,  # [C] f32 — input-BN fold shift (identity: zeros)
    w: jax.Array,  # [C, F] f32/bf16 dot weights
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(x̂@W, Σx̂, x̂ᵀx̂) with x̂ = relu(y·a + b), in one HBM pass over y."""
    return _fwd_impl(y, a, b, w, use_pallas)


def _vjp_fwd(y, a, b, w, use_pallas=None):
    out = _fwd_impl(y, a, b, w, use_pallas)
    return out, (y, a, b, w)


def _vjp_bwd(use_pallas, residuals, cotangents):
    y, a, b, w = residuals
    g_out, g_s1, g_s2 = cotangents
    dtype = y.dtype
    xh32 = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0)
    xh = xh32.astype(dtype)
    # d x̂ from the three outputs; s2 = x̂ᵀx̂ is symmetric-bilinear in x̂
    g_xh = (
        jnp.dot(g_out.astype(dtype), w.astype(dtype).T).astype(jnp.float32)
        + g_s1.astype(jnp.float32)[None, :]
        + jnp.dot(xh, (g_s2 + g_s2.T).astype(dtype)).astype(jnp.float32)
    )
    t = jnp.where(xh32 > 0.0, g_xh, 0.0)
    dy = (t * a).astype(y.dtype)
    da = jnp.sum(t * y.astype(jnp.float32), axis=0)
    db = jnp.sum(t, axis=0)
    dw = jax.lax.dot_general(
        xh, g_out.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dy, da, db, dw


affine_relu_dot_moments.defvjp(_vjp_fwd, _vjp_bwd)
