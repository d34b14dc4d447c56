"""EfficientNet-B0…B4 feature extractors in flax.linen, NHWC.

Capability parity with the reference's ``efficientnet_pytorch`` backbones
(``models/building_blocks/backbone_models.py:92-124``): MBConv inverted
bottlenecks with squeeze-excitation and swish, width/depth compound scaling,
feature-extractor output = post-head-conv spatial map with the reference's
advertised channel counts (B0:1280, B1:1280, B2:1408, B3:1536, B4:1792).
Implemented from the EfficientNet paper definition (not ported code).
"""

import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vince_tpu.models.resnet import Conv1x1, FoldCfg, folded_dot_bn

# (expand_ratio, out_channels, num_repeats, stride, kernel_size) per stage
_BASE_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# variant -> (width_mult, depth_mult)
_SCALING = {
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
}


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class DepthwiseConv(nn.Module):
    """Depthwise k×k conv with selectable emission, one shared param tree
    (``kernel`` [k,k,1,C] — identical to
    ``nn.Conv(C, (k,k), feature_group_count=C)``).

    kind:
      - ``"conv"``: XLA grouped-convolution op (fastest; default).
      - ``"tap"``: k² shifted FMAs as XLA slices (measured 2.4× slower at
        B0 scale — the slices materialize; kept as a documented negative).
      - ``"pallas"``: VPU kernel for stride-1 sites
        (``ops/pallas/depthwise_kernel.py``); stride-2/oversized sites fall
        back to the grouped-conv op. Measured 72.5 vs 43.4 ms/step at the
        B0 headline config — the pallas_call fusion boundaries cost more
        than the kernel saves (docs/PERFORMANCE.md); documented negative.
    """

    kernel: int
    strides: int = 1
    kind: str = "conv"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, c), jnp.float32
        ).astype(x.dtype)
        if self.kind == "pallas":
            from vince_tpu.ops.pallas import depthwise_kernel

            # standardized tri-state dispatch (conv_bn_kernel.USE_PALLAS
            # contract): default-backend sniff, overridable per-module for
            # tests/benchmarks. Init traces on CPU (jax.default_device(cpu)
            # param init) — the XLA path there keeps init host-runnable;
            # param trees are identical either way.
            if (not self.is_initializing()
                    and depthwise_kernel.use_pallas(x.shape, k, self.strides)):
                return depthwise_kernel.depthwise_conv_pallas(x, w)
        elif self.kind == "tap":
            return _tap_sum(x, w, k, self.strides)
        return jax.lax.conv_general_dilated(
            x, w, (self.strides, self.strides), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )


class DepthwiseConvTap(nn.Module):
    """Depthwise k×k conv emitted as k² shifted elementwise FMAs ("tap sum")
    instead of a grouped-convolution op.

    Identical math and param tree to
    ``nn.Conv(C, (k,k), feature_group_count=C, padding="SAME")`` (TF-SAME
    asymmetric padding for stride 2). Motivation: XLA:TPU emits grouped convs
    as convolution ops, which neither use the MXU well (1-channel contraction)
    nor admit BatchNorm stat fusion (stats fuse into *dot* and *loop* fusions
    only — the round-1 ``Conv1x1`` finding). A depthwise conv is elementwise
    per tap, so this formulation turns the whole
    bn→swish→depthwise→bn-stats chain into loop fusions. Accumulates in f32
    (the conv op also accumulates above bf16).
    """

    kernel: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        c = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, c), jnp.float32
        ).astype(x.dtype)
        return _tap_sum(x, w, k, self.strides)


def _tap_sum(x, w, k: int, s: int):
    dtype = x.dtype
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = -(-h_in // s), -(-w_in // s)
    pad_h = max((h_out - 1) * s + k - h_in, 0)
    pad_w = max((w_out - 1) * s + k - w_in, 0)
    x = jnp.pad(
        x,
        ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
         (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
    )
    acc = None
    for i in range(k):
        for j in range(k):
            tap = x[:, i : i + (h_out - 1) * s + 1 : s,
                    j : j + (w_out - 1) * s + 1 : s, :] * w[i, j, 0]
            tap = tap.astype(jnp.float32)
            acc = tap if acc is None else acc + tap
    return acc.astype(dtype)


class SqueezeExcite(nn.Module):
    reduced: int
    # return the [n,1,1,C] gate instead of applying it — the caller folds it
    # into the project conv's weights (se_kind="fold"); param tree unchanged
    return_scale: bool = False

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv1x1(self.reduced, use_bias=True, name="reduce")(s)
        s = nn.swish(s)
        s = Conv1x1(x.shape[-1], use_bias=True, name="expand")(s)
        if self.return_scale:
            return nn.sigmoid(s)
        return x * nn.sigmoid(s)


class Conv1x1SEFold(nn.Module):
    """Project conv with the per-sample SE gate folded into its weights.

    ``(y · diag(s_n)) W  ==  y · (diag(s_n) W)`` — instead of materializing
    the gated activation (an HBM write+read of the full H·W·6C tensor when
    XLA keeps the multiply in a separate loop fusion), scale the tiny
    [C, F] kernel per sample (n·C·F flops) and emit ONE batched
    ``dot_general``. Same param name/shape as ``Conv1x1`` → checkpoints and
    torch-weight conversion are unaffected. Structured attempt at the
    SE-pool fusion barrier (VERDICT r2 #6); keep whichever measures faster.
    """

    features: int

    @nn.compact
    def __call__(self, x, scale):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        ).astype(x.dtype)
        # [n, C, F] per-sample weights; batched over n, contracting C
        w = kernel[0, 0][None, :, :] * scale[:, 0, 0, :, None].astype(x.dtype)
        return jax.lax.dot_general(x, w, (((3,), (1,)), ((0,), (0,))))


class MBConv(nn.Module):
    filters: int
    expand_ratio: int
    kernel: int
    strides: int
    norm: Any
    se_ratio: float = 0.25
    # derived-stat BN folding for the 1×1 *expand* conv (Cin→6·Cin: the xᵀx
    # moment dot is 1/6 of the main dot's FLOPs — see resnet.folded_dot_bn).
    # The project conv reduces 6C→C, where the fold costs more than it saves.
    fold_cfg: Optional[FoldCfg] = None
    dw_kind: str = "conv"  # {"conv", "tap"} — see DepthwiseConvTap
    se_kind: str = "mul"  # {"mul", "fold"} — see Conv1x1SEFold

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = x
        expanded = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            if self.fold_cfg is not None:
                y = folded_dot_bn(
                    y, expanded, self.fold_cfg,
                    conv_name="expand_conv", bn_name="expand_bn", act=nn.swish,
                )
            else:
                y = Conv1x1(expanded, name="expand_conv")(y)
                y = self.norm(name="expand_bn")(y)
                y = nn.swish(y)
        # TF-SAME (asymmetric for stride 2) matches the reference package's
        # Conv2dStaticSamePadding — required for torch-weight forward parity.
        y = DepthwiseConv(
            self.kernel, strides=self.strides, kind=self.dw_kind,
            name="depthwise_conv",
        )(y)
        y = self.norm(name="depthwise_bn")(y)
        y = nn.swish(y)
        reduced = max(1, int(in_ch * self.se_ratio))
        if self.se_kind == "fold":
            gate = SqueezeExcite(reduced, return_scale=True, name="se")(y)
            y = Conv1x1SEFold(self.filters, name="project_conv")(y, gate)
        else:
            y = SqueezeExcite(reduced, name="se")(y)
            y = Conv1x1(self.filters, name="project_conv")(y)
        y = self.norm(name="project_bn")(y)
        if self.strides == 1 and in_ch == self.filters:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """Spatial feature extractor; `__call__` returns [N, H/32, W/32, C_head]."""

    variant: str = "b0"
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False  # rematerialize MBConv blocks
    # {"none", "expand", "all"}: fold BN into the channel-expanding 1×1 dots
    # (expand_conv + head_conv) via derived input moments; "all" behaves like
    # "expand" here (reducing project_conv folds are never profitable)
    bn_fold: str = "none"
    # {"conv", "tap"}: emit depthwise convs as grouped-conv ops or as k²
    # shifted elementwise FMAs (loop fusions — see DepthwiseConvTap)
    dw_kind: str = "conv"
    # {"mul", "fold"}: apply the SE gate as an elementwise multiply or fold
    # it into the project conv's per-sample weights (Conv1x1SEFold)
    se_kind: str = "mul"

    @property
    def output_channels(self) -> int:
        width, _ = _SCALING[self.variant]
        return round_filters(1280, width)

    @nn.compact
    def __call__(self, x, train: bool = True):
        width, depth = _SCALING[self.variant]
        norm = functools.partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )
        fold_cfg = None
        if self.bn_fold != "none":
            fold_cfg = FoldCfg(
                train=train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )
        x = x.astype(self.dtype)
        x = nn.Conv(
            round_filters(32, width), (3, 3), strides=(2, 2),
            padding="SAME", use_bias=False, name="stem_conv",
        )(x)
        x = norm(name="stem_bn")(x)
        x = nn.swish(x)
        block_idx = 0
        block_cls = nn.remat(MBConv) if self.remat else MBConv
        for expand, channels, repeats, stride, kernel in _BASE_BLOCKS:
            out_ch = round_filters(channels, width)
            for r in range(round_repeats(repeats, depth)):
                x = block_cls(
                    filters=out_ch,
                    expand_ratio=expand,
                    kernel=kernel,
                    strides=stride if r == 0 else 1,
                    norm=norm,
                    fold_cfg=fold_cfg,
                    dw_kind=self.dw_kind,
                    se_kind=self.se_kind,
                    name=f"block_{block_idx}",
                )(x)
                block_idx += 1
        if fold_cfg is not None:
            return folded_dot_bn(
                x, self.output_channels, fold_cfg,
                conv_name="head_conv", bn_name="head_bn", act=nn.swish,
            )
        x = Conv1x1(self.output_channels, name="head_conv")(x)
        x = norm(name="head_bn")(x)
        return nn.swish(x)


EfficientNetB0 = functools.partial(EfficientNet, variant="b0")
EfficientNetB1 = functools.partial(EfficientNet, variant="b1")
EfficientNetB2 = functools.partial(EfficientNet, variant="b2")
EfficientNetB3 = functools.partial(EfficientNet, variant="b3")
EfficientNetB4 = functools.partial(EfficientNet, variant="b4")
