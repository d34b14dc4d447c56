"""SiamFC batched cross-correlation.

Parity with reference ``models/end_task_tracking_model.py:46-53``
(``_fast_xcorr``: grouped-conv trick so each batch item's exemplar correlates
only its own search region). TPU-native mapping per SURVEY.md §2.10: a vmapped
``lax.conv_general_dilated`` — XLA batches the per-item convolutions onto the
MXU directly; no group reshaping needed.
"""

import jax
import jax.numpy as jnp
from jax import lax


def fast_xcorr(z: jax.Array, x: jax.Array, out_scale: float = 1e-3) -> jax.Array:
    """z: [B, hz, wz, C] exemplar features; x: [B, hx, wx, C] search features.
    Returns response maps [B, hx-hz+1, wx-wz+1, 1], scaled by ``out_scale``
    (reference :43 ``out_scale=1e-3``)."""

    def one(zi, xi):
        kernel = zi[..., None]  # [hz, wz, C, 1] HWIO
        return lax.conv_general_dilated(
            xi[None].astype(jnp.float32),
            kernel.astype(jnp.float32),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    return jax.vmap(one)(z, x) * out_scale


def multi_scale_xcorr(z: jax.Array, x_scales: jax.Array, out_scale: float = 1e-3) -> jax.Array:
    """One exemplar vs S search scales: z [hz, wz, C], x_scales [S, hx, wx, C]
    → [S, hy, wy] (the tracker's 3-scale pyramid forward, reference
    ``siamfc_pytorch/tracker.py:119-141``)."""
    kernel = z[..., None]
    resp = lax.conv_general_dilated(
        x_scales.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return resp[..., 0] * out_scale
