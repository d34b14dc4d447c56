"""Pallas depthwise-convolution kernel for EfficientNet MBConv blocks.

Why: XLA:TPU emits ``feature_group_count=C`` convolutions through the MXU at
~1/128 lane utilization — the B0 trace attributes **14.3 ms/step (of 40 ms
device-busy) to depthwise-conv fusions running at ~2 TF/s effective and only
535 GB/s** (see docs/PERFORMANCE.md round-2 B0 section). A depthwise conv is
elementwise per tap (no channel contraction), i.e. VPU work: this kernel
computes the k² taps as shifted FMAs over a VMEM-resident block, reading and
writing each activation exactly once at HBM bandwidth.

Scope (the B0 cost profile, not full generality):
- stride 1, odd k (3/5), NHWC, TF-SAME (symmetric) padding. 12 of B0's 16
  depthwise sites are stride-1; the 4 stride-2 sites stay on XLA (they carry
  ~18% of the dw FLOPs and their halved-resolution outputs fuse fine).
- whole image per block, with the ≤16 MB scoped-VMEM stack budgeted at the
  *lane-padded* channel count (VMEM tiles are (8,128): C=32 costs 4× its
  nominal bytes). B0's stem-adjacent 112²·C32 site busts that budget and
  also falls back to XLA; the ≤56² stride-1 sites (11 of 16, the MBConv
  bulk) run here.
- custom VJP: dgrad = same kernel with a spatially flipped kernel (exact for
  stride 1 + symmetric padding); wgrad = k² shifted multiply-reduces in XLA
  (the same multi-output reduce fusions XLA already runs at ~683 GB/s).

Reference behavior being accelerated: the MBConv depthwise stage of
``efficientnet_pytorch`` models (reference ``backbone_models.py:92-124``).

MEASURED VERDICT (real v5e, full B0 pretrain step b=128 @224², q=65536):
**72.5 ms vs 43.4 ms** for the XLA grouped-conv baseline — a clear negative.
The kernel itself reads/writes at HBM speed, but each ``pallas_call`` is a
fusion boundary: the bn→swish producer and the BN-stats consumer that XLA
fuses *into* the grouped-conv fusions must now materialize their operands
around the custom call, and the custom-VJP dgrad/wgrad split breaks the
backward fusions the same way. Third datapoint of the round-1/2 pattern
(conv3×3+stats, folded-dot kernels): Mosaic cannot beat XLA's
layout-integrated pipelines at these shapes once boundary costs count.
Kept in-tree, parity-tested, default off (``--dw-kind conv``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # importable on CPU too (interpret mode)
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
except ImportError:  # pragma: no cover
    pltpu = None

# per-block VMEM budget ≈ nb·H·W·Cpad·(2B in ×2buf + 2B out ×2buf + 2B pad
# scratch + 4B f32 acc + 4B live tap temp) ≈ 9× the bf16 block — keep the
# bf16 block below ~1.5 MB (≈13.5 MB total vs the 16 MB scoped-vmem limit).
# Cpad: VMEM tiles are (8, 128), so the channel (lane) dim is physically
# padded to a multiple of 128 — C=32 costs 4× its nominal bytes (measured:
# nominal budgeting OOM'd the scoped stack at B0's 112²·C32 site — 21.7 MB
# at a 3.2 MB padded block, ~6.8× the bf16 block; 1.7 MB keeps the stack
# ≤ ~12 MB and still admits the 56²·C144 site).
_BLOCK_BYTES = 1_700_000


def _lane_padded(c: int) -> int:
    return -(-c // 128) * 128


# tri-state dispatch override, same contract as conv_bn_kernel.USE_PALLAS:
# None = auto (process default backend is a TPU), True/False force the
# Pallas / XLA path
USE_PALLAS = None


def use_pallas(x_shape, kernel: int, stride: int, override=None) -> bool:
    """Shared dispatch predicate (mirrors conv_bn_kernel._use_pallas): shape
    support AND (explicit override, else module override, else
    default-backend sniff)."""
    if not kernel_supported(x_shape, kernel, stride):
        return False
    if override is not None:
        return override
    if USE_PALLAS is not None:
        return USE_PALLAS
    import jax

    return jax.default_backend() in ("tpu", "axon")


def kernel_supported(x_shape, kernel: int, stride: int) -> bool:
    """Shapes this kernel handles (callers fall back to XLA otherwise).

    Large-H·W / small-C sites (B0's 112²·C32 and 56²·C144) bust the VMEM
    block budget once lane padding is priced in and stay on the XLA grouped
    conv; the ≤28² stride-1 sites (the MBConv bulk) run here.
    """
    if stride != 1 or kernel not in (3, 5):
        return False
    n, h, w, c = x_shape
    if h < kernel or w < kernel:
        return False
    # one image must fit the block budget (at its lane-padded byte cost)
    return h * w * _lane_padded(c) * 2 <= _BLOCK_BYTES


def _dw_kernel(x_ref, w_ref, o_ref, xp_ref, acc_ref, *, k: int, pad: int):
    nb, h, w, c = x_ref.shape
    xp_ref[...] = jnp.zeros_like(xp_ref)
    xp_ref[:, pad : pad + h, pad : pad + w, :] = x_ref[...]
    wk = w_ref[...].astype(jnp.float32)  # [k, k, 1, C]
    # Accumulate in-place into an f32 VMEM scratch: a value-chained
    # `acc = acc + tap` keeps all k² f32 taps live on the Mosaic stack
    # (34 MB at 112²·32 — scoped-vmem OOM); the store after each tap keeps
    # exactly one temp live.
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for i in range(k):
        for j in range(k):
            tap = xp_ref[:, i : i + h, j : j + w, :].astype(jnp.float32)
            acc_ref[...] += tap * wk[i, j, 0].reshape(1, 1, 1, c)
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _batch_block(n: int, h: int, w: int, c: int) -> int:
    nb = 1
    cp = _lane_padded(c)
    while nb * 2 <= n and n % (nb * 2) == 0 and 2 * nb * h * w * cp * 2 <= _BLOCK_BYTES:
        nb *= 2
    return nb


def _dw_pallas(x, w, *, interpret: bool = False):
    n, h, wd, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    nb = _batch_block(n, h, wd, c)
    grid = (n // nb,)
    out = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, pad=pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, wd, c), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((k, k, 1, c), lambda b: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, h, wd, c), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, h + 2 * pad, wd + 2 * pad, c), x.dtype),
            pltpu.VMEM((nb, h, wd, c), jnp.float32),
        ] if pltpu is not None else [],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * c * k * k,
            bytes_accessed=2 * n * h * wd * c * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w.astype(x.dtype))
    return out


def _wgrad(x, g, k: int):
    """dL/dw for stride-1 SAME depthwise: k² shifted multiply-reduces."""
    n, h, w, c = x.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    for i in range(k):
        row = []
        for j in range(k):
            xs = xp[:, i : i + h, j : j + w, :]
            row.append(jnp.sum((xs * g).astype(jnp.float32), axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)[:, :, None, :]  # [k, k, 1, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv_pallas(x, w, interpret: bool = False):
    """Stride-1 TF-SAME depthwise conv, Pallas forward + custom VJP.

    ``x`` [N,H,W,C] (bf16/f32), ``w`` [k,k,1,C]; returns [N,H,W,C] in
    ``x.dtype``. Use :func:`kernel_supported` before calling; stride-2 or
    oversized sites must use ``lax.conv_general_dilated`` instead.
    """
    return _dw_pallas(x, w, interpret=interpret)


def _vjp_fwd(x, w, interpret):
    return _dw_pallas(x, w, interpret=interpret), (x, w)


def _vjp_bwd(interpret, residuals, g):
    x, w = residuals
    k = w.shape[0]
    # stride-1 symmetric-SAME dgrad == depthwise conv with flipped taps
    dx = _dw_pallas(g, w[::-1, ::-1], interpret=interpret).astype(x.dtype)
    dw = _wgrad(x, g, k).astype(w.dtype)
    return dx, dw


depthwise_conv_pallas.defvjp(_vjp_fwd, _vjp_bwd)
