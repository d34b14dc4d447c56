"""ResNet backbones in flax.linen, NHWC (TPU-native layout).

Capability parity with the reference's vendored torchvision ResNet
(``models/building_blocks/resnet.py``): BasicBlock (:53-92), Bottleneck
(:95-137), the full-network plumbing incl. ``replace_stride_with_dilation``
(:140-250 — extended to BasicBlock, the reason the reference vendors it,
``resnet.py:5-6,64-68``), and factories resnet18/34/50/101/152 (:261-373).

TPU-first choices (not translations):
  - NHWC everywhere; convs hit the MXU with XLA's native layout.
  - BatchNorm via flax with explicit ``use_running_average`` and a pluggable
    ``axis_name`` so data-parallel training can pick per-device stats (MoCo
    shuffled-BN leakage control, SURVEY.md §5.8) or cross-chip sync-BN.
  - Stride-to-dilation for the SiamFC dense-feature variants
    (reference ``backbone_models.py:78-89``) implemented with
    ``kernel_dilation`` on lax conv — no im2col tricks needed.
"""

import functools
import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class FoldCfg(NamedTuple):
    """Config bundle for derived-stat BN folding (see ``folded_dot_bn``)."""

    train: bool
    momentum: float
    epsilon: float
    dtype: Any
    axis_name: Optional[str]
    # route the bn2→relu→conv3 chain through the Pallas fused
    # affine+relu+dot+moments kernel (see fused_bn_relu_folded_dot)
    use_kernel: bool = False


class StemConvS2D(nn.Module):
    """7×7-stride-2 stem conv computed as a space-to-depth 4×4-stride-1 conv
    (the MLPerf-ResNet TPU trick): the 3-channel input fills only 3/128 MXU
    lanes; 2×2-blocking to 12 channels with a zero-padded 8×8 kernel is
    mathematically identical (max |err| ~1e-6 f32) and MXU-friendlier.
    Parameter tree matches ``nn.Conv`` ([7,7,Cin,Cout] "kernel") so torch
    weight conversion and checkpoints are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        # input: pad (4, 2 (+1 if odd)) each spatial dim; kernel: zero-pad 7→8
        # at top-left so every 8×8 window starts on a 2×2 block boundary.
        # Output length (H+6-8)/2+1 (resp. (H+7-8)/2+1) = ceil(H/2) = direct.
        ph = 2 + x.shape[1] % 2
        pw = 2 + x.shape[2] % 2
        xp = jnp.pad(x, ((0, 0), (4, ph), (4, pw), (0, 0)))
        b, h, w, c = xp.shape
        xb = (
            xp.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kb = (
            kp.reshape(4, 2, 4, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * cin, self.features)
        )
        return jax.lax.conv_general_dilated(
            xb, kb, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Conv1x1(nn.Module):
    """1×1 conv emitted as ``dot_general`` instead of a convolution op.

    Identical math and param tree to ``nn.Conv(features, (1,1))``, but XLA:TPU
    fuses the BatchNorm batch-stat reductions into dot fusions while it leaves
    them as separate (HBM-bound) passes after convolution ops — measured
    +0.02 ms vs +0.36 ms for a stage-1-sized matmul on v5e. Strides are a
    spatial slice (exact for a 1×1 kernel).
    """

    features: int
    strides: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        ).astype(x.dtype)
        if self.strides != 1:
            x = x[:, :: self.strides, :: self.strides, :]
        y = jax.lax.dot_general(
            x, kernel[0, 0], (((x.ndim - 1,), (0,)), ((), ()))
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(x.dtype)
            y = y + bias
        return y


class _ConvKernelParam(nn.Module):
    """Bare param holder matching ``Conv1x1``'s tree ([1,1,Cin,Cout] "kernel")
    so folded and unfolded paths share checkpoints bit-for-bit."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _BNStateParam(nn.Module):
    """Param/batch_stats holder matching ``nn.BatchNorm``'s tree
    (params scale/bias; batch_stats mean/var) for the folded path.

    In train mode it receives externally derived batch statistics, updates the
    running averages exactly like flax BatchNorm (new = m*old + (1-m)*batch,
    biased batch var), and returns (scale, bias). In eval mode it returns the
    running statistics for classic inference folding.
    """

    features: int
    momentum: float
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, batch_mean: Optional[jax.Array], batch_var: Optional[jax.Array]):
        scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        if batch_mean is None:  # eval: use running averages
            return scale, bias, ra_mean.value, ra_var.value
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        return scale, bias, batch_mean, batch_var


def folded_dot_bn(
    x: jax.Array,
    features: int,
    cfg: FoldCfg,
    *,
    conv_name: str,
    bn_name: str,
    strides: int = 1,
    act: Any = None,  # post-BN activation (nn.relu / nn.swish / None)
    residual: Optional[jax.Array] = None,
    scale_init: Any = nn.initializers.ones,
) -> jax.Array:
    """1×1-conv + BatchNorm (+residual, +ReLU) with the BN batch statistics
    *derived from the input's moments* and folded into the dot weights.

    For y = x@W (1×1 conv), the per-channel batch stats of y are exact
    functions of x's first/second moments: μ_y = (Σx)@W / n and
    E[y²] = diag(Wᵀ(xᵀx)W) / n, so BN(y)·γ+β = x@(W·a) + b with
    a = γ·rsqrt(var+ε), b = β − μ_y·a. This removes the pre-norm activation's
    HBM write+read (the reference-path BN barrier) in forward *and* backward —
    the dominant traffic for bottleneck 1×1 expansions — at the cost of one
    small xᵀx dot (n·Cin² FLOPs vs n·Cin·Cout for the main dot). Same math as
    ``Conv1x1`` + ``nn.BatchNorm`` (reference ``resnet.py:95-137`` semantics):
    f32-exact to ~1e-6; autodiff gradients are the exact BN gradients because
    the function is identical. Param tree matches the unfolded path.

    With ``cfg.axis_name`` set, moments are psum'd across the mesh axis —
    sync-BN at [Cin]+[Cin,Cin] communication cost.

    Numerical regime: the variance comes from the uncentered identity
    E[y²]−μ² evaluated in f32 on bf16 activations, so cancellation error
    scales with (μ/σ)² per channel. For post-ReLU inputs this ratio is small
    (tests bound the var error tail at ~1e-3 relative); it degrades when a
    channel's mean dominates its spread — e.g. near-constant activations
    (dead ReLU channels are safe: both moments →0, and the ε floor + the
    max(var,0) clamp keep the fold finite). flax's own BatchNorm uses the
    same uncentered formulation; the fold adds one extra f32 rounding on the
    W-projection. For numerical debugging at scale, compare against
    ``--bn-fold none`` (same params, same math, centered two-pass stats via
    flax) and watch BN running-var drift on long soaks — the centered
    *folded* variant is intentionally not shipped (measured +18 ms/step,
    docs/PERFORMANCE.md).
    """
    cin = x.shape[-1]
    kernel = _ConvKernelParam((1, 1, cin, features), name=conv_name)()
    w = kernel[0, 0]  # [Cin, Cout] f32
    if strides != 1:
        x = x[:, ::strides, ::strides, :]
    batch_dims = tuple(range(x.ndim - 1))
    bn = _BNStateParam(features, cfg.momentum, scale_init=scale_init, name=bn_name)
    if cfg.train:
        # Uncentered moments, straight off the bf16 activations: centering
        # first would materialize an f32 copy of x (dots read materialized
        # operands — producer fusion doesn't cross a dot boundary), costing
        # more HBM traffic than the fold saves. E[y²]−μ² matches flax
        # BatchNorm's own formulation (same cancellation behavior; the eps
        # floor covers near-constant channels either way). All dots run on
        # the 4D tensor (multi-dim contractions) — no reshapes to [rows, C],
        # which XLA:TPU materializes as real copies.
        n = jnp.asarray(math.prod(x.shape[d] for d in batch_dims), jnp.float32)
        s1 = jnp.sum(x, axis=batch_dims, dtype=jnp.float32)
        s2 = jax.lax.dot_general(
            x, x, ((batch_dims, batch_dims), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if cfg.axis_name is not None:
            s1 = jax.lax.psum(s1, cfg.axis_name)
            s2 = jax.lax.psum(s2, cfg.axis_name)
            n = n * jax.lax.psum(1, cfg.axis_name)
        mu = (s1 / n) @ w
        var = jnp.maximum(jnp.sum((s2 @ w) * w, axis=0) / n - mu * mu, 0.0)
        scale, bias, mu, var = bn(mu, var)
    else:
        scale, bias, mu, var = bn(None, None)
    a = scale * jax.lax.rsqrt(var + cfg.epsilon)
    b = (bias - mu * a).astype(cfg.dtype)
    y = jax.lax.dot_general(
        x.astype(cfg.dtype),
        (w * a[None, :]).astype(cfg.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
    )
    y = y + b
    if residual is not None:
        y = y + residual
    return act(y) if act is not None else y


def fused_bn_relu_folded_dot(
    y: jax.Array,  # RAW pre-activation (conv2 output), [N, H, W, C]
    features: int,
    cfg: FoldCfg,
    *,
    in_bn_name: str,
    conv_name: str,
    bn_name: str,
    act: Any = None,
    residual: Optional[jax.Array] = None,
    scale_init: Any = nn.initializers.ones,
) -> jax.Array:
    """The whole ``bn2 → relu → conv3(1×1) → bn3`` chain with ONE HBM pass
    over the pre-activation.

    XLA fuses elementwise producers into convolutions but not into dots, so
    the folded conv3 path materializes x̂ = relu(bn2(y)) and reads it for the
    main dot and the moment dots. Here bn2's batch stats come from one reduce
    over raw ``y`` (fusable into conv2's epilogue), and the Pallas kernel
    ``affine_relu_dot_moments`` applies bn2's affine + ReLU in registers while
    computing both the main dot and x̂'s moments — x̂ never exists in HBM.
    Same math and param tree as ``nn.BatchNorm(bn2) + relu + folded_dot_bn``;
    bn3's scale lands as a per-channel epilogue on the dot output (fused into
    the residual-add/ReLU consumer).
    """
    from vince_tpu.ops.pallas.folded_dot_kernel import affine_relu_dot_moments

    c = y.shape[-1]
    batch_dims = tuple(range(y.ndim - 1))
    n = jnp.asarray(math.prod(y.shape[d] for d in batch_dims), jnp.float32)
    in_bn = _BNStateParam(c, cfg.momentum, name=in_bn_name)
    kernel = _ConvKernelParam((1, 1, c, features), name=conv_name)()
    w = kernel[0, 0]  # [C, F] f32
    bn = _BNStateParam(features, cfg.momentum, scale_init=scale_init, name=bn_name)

    if cfg.train:
        y32 = y.astype(jnp.float32)
        s1y = jnp.sum(y32, axis=batch_dims)
        s2y = jnp.sum(y32 * y32, axis=batch_dims)
        if cfg.axis_name is not None:
            s1y = jax.lax.psum(s1y, cfg.axis_name)
            s2y = jax.lax.psum(s2y, cfg.axis_name)
            n = n * jax.lax.psum(1, cfg.axis_name)
        mu2 = s1y / n
        var2 = jnp.maximum(s2y / n - mu2 * mu2, 0.0)
        scale2, bias2, mu2, var2 = in_bn(mu2, var2)
    else:
        scale2, bias2, mu2, var2 = in_bn(None, None)
    a2 = scale2 * jax.lax.rsqrt(var2 + cfg.epsilon)
    b2 = bias2 - mu2 * a2

    if cfg.train:
        yflat = y.reshape(-1, c).astype(cfg.dtype)
        out_raw, s1, s2 = affine_relu_dot_moments(yflat, a2, b2, w)
        if cfg.axis_name is not None:
            s1 = jax.lax.psum(s1, cfg.axis_name)
            s2 = jax.lax.psum(s2, cfg.axis_name)
        mu3 = (s1 / n) @ w
        var3 = jnp.maximum(jnp.sum((s2 @ w) * w, axis=0) / n - mu3 * mu3, 0.0)
        scale3, bias3, mu3, var3 = bn(mu3, var3)
        out = out_raw.reshape(y.shape[:-1] + (features,))
    else:
        scale3, bias3, mu3, var3 = bn(None, None)
        xh = nn.relu(y.astype(cfg.dtype) * a2.astype(cfg.dtype) + b2.astype(cfg.dtype))
        out = jax.lax.dot_general(
            xh, w.astype(cfg.dtype), (((y.ndim - 1,), (0,)), ((), ()))
        )
    a3 = scale3 * jax.lax.rsqrt(var3 + cfg.epsilon)
    b3 = (bias3 - mu3 * a3).astype(cfg.dtype)
    out = out * a3.astype(cfg.dtype) + b3
    if residual is not None:
        out = out + residual
    return act(out) if act is not None else out


def _kernel_site_supported(y: jax.Array, features: int) -> bool:
    m = math.prod(y.shape[:-1])
    return y.shape[-1] % 128 == 0 and features % 128 == 0 and m % 128 == 0


class BasicBlock(nn.Module):
    """2×(3×3 conv) residual block — reference resnet.py:53-92."""

    filters: int
    norm: ModuleDef
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 1
    fold_cfg: Optional[FoldCfg] = None  # derived-stat BN folding for 1×1 convs

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv1",
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # conv2 is UNDILATED in the reference's vendored BasicBlock
        # (resnet.py:71 — conv3x3(planes, planes), dilation 1) even when the
        # stage is dilated; only conv1 carries the dilation (:68)
        y = nn.Conv(
            self.filters,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=False,
            name="conv2",
        )(y)
        y = self.norm(name="bn2", scale_init=nn.initializers.zeros)(y)
        if self.downsample:
            if self.fold_cfg is not None:
                residual = folded_dot_bn(
                    residual, self.filters * self.expansion, self.fold_cfg,
                    strides=self.strides,
                    conv_name="downsample_conv", bn_name="downsample_bn",
                )
            else:
                residual = Conv1x1(
                    self.filters * self.expansion, strides=self.strides,
                    name="downsample_conv",
                )(residual)
                residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 residual block — reference resnet.py:95-137.

    Stride on the 3×3 (torchvision/reference convention, resnet.py:107-110).
    """

    filters: int
    norm: ModuleDef
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4
    fold_cfg: Optional[FoldCfg] = None  # derived-stat BN folding for 1×1 convs
    fold_all: bool = False  # also fold conv1 (the channel-reducing 1×1)

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.fold_cfg is not None and self.fold_all:
            y = folded_dot_bn(
                x, self.filters, self.fold_cfg,
                conv_name="conv1", bn_name="bn1", act=nn.relu,
            )
        else:
            y = Conv1x1(self.filters, name="conv1")(x)
            y = self.norm(name="bn1")(y)
            y = nn.relu(y)
        y = nn.Conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv2",
        )(y)
        if self.fold_cfg is not None:
            if self.downsample:
                residual = folded_dot_bn(
                    residual, self.filters * self.expansion, self.fold_cfg,
                    strides=self.strides,
                    conv_name="downsample_conv", bn_name="downsample_bn",
                )
            out_ch = self.filters * self.expansion
            if self.fold_cfg.use_kernel and _kernel_site_supported(y, out_ch):
                # one-HBM-pass bn2→relu→conv3→bn3 (Pallas); same params/math
                return fused_bn_relu_folded_dot(
                    y, out_ch, self.fold_cfg,
                    in_bn_name="bn2", conv_name="conv3", bn_name="bn3",
                    act=nn.relu, residual=residual,
                    scale_init=nn.initializers.zeros,
                )
            y = self.norm(name="bn2")(y)
            y = nn.relu(y)
            return folded_dot_bn(
                y, self.filters * self.expansion, self.fold_cfg,
                conv_name="conv3", bn_name="bn3",
                act=nn.relu, residual=residual,
                scale_init=nn.initializers.zeros,
            )
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = Conv1x1(self.filters * self.expansion, name="conv3")(y)
        y = self.norm(name="bn3", scale_init=nn.initializers.zeros)(y)
        if self.downsample:
            residual = Conv1x1(
                self.filters * self.expansion, strides=self.strides,
                name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-extractor ResNet (torchvision-semantics, reference resnet.py:140-250).

    ``__call__`` returns spatial features [N, H/stride, W/stride, C] — the
    ``final_layer=-2`` truncation the reference always uses for VINCE
    (``vince_model.py:26``, ``backbone_models.py:39-54``); pooling/classifier
    heads are separate modules.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_filters: int = 64
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    norm_kind: str = "batchnorm"  # {"batchnorm", "groupnorm"}
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None  # set to sync BN stats across this mesh axis
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM at big batch)
    stem_kind: str = "conv7"  # {"conv7", "s2d"} — same math, same param tree
    # {"none", "expand", "all"}: fold BN into 1×1 dots via derived batch stats
    # (same math, same param tree; "expand" = conv3+downsample, "all" = +conv1)
    bn_fold: str = "none"
    # route bn2→relu→conv3 through the Pallas fused kernel (train mode,
    # supported shapes; requires bn_fold != "none")
    fold_kernel: bool = False

    @property
    def output_channels(self) -> int:
        expansion = 4 if self.block_cls is Bottleneck else 1
        return self.num_filters * 8 * expansion

    def _make_norm(self, train: bool):
        if self.norm_kind == "groupnorm":
            return functools.partial(nn.GroupNorm, num_groups=32, dtype=self.dtype)
        return functools.partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = self._make_norm(train)
        fold_cfg = None
        if self.bn_fold != "none" and self.norm_kind != "batchnorm":
            # derived-stat folding is a BatchNorm identity; other norms have
            # no batch stats to fold — run unfolded rather than silently
            # changing semantics (prints once per trace)
            print(f"bn_fold={self.bn_fold!r} is a no-op with norm_kind="
                  f"{self.norm_kind!r}; running unfolded")
        if self.bn_fold != "none" and self.norm_kind == "batchnorm":
            fold_cfg = FoldCfg(
                train=train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                use_kernel=self.fold_kernel,
            )
        x = x.astype(self.dtype)
        if self.stem_kind == "s2d":
            x = StemConvS2D(self.num_filters, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(
                self.num_filters,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=False,
                name="conv1",
            )(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        dilation = 1
        for stage, num_blocks in enumerate(self.stage_sizes):
            filters = self.num_filters * (2 ** stage)
            stride = 1 if stage == 0 else 2
            # reference resnet.py:176-186 — convert stride to dilation per
            # stage; torchvision's first block of a dilated stage keeps
            # previous_dilation (resnet.py:201-213), later blocks dilate
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
            for block in range(num_blocks):
                expansion = 4 if self.block_cls is Bottleneck else 1
                in_ch = x.shape[-1]
                s = stride if block == 0 else 1
                needs_down = s != 1 or in_ch != filters * expansion
                extra = (
                    {"fold_all": self.bn_fold == "all"}
                    if self.block_cls is Bottleneck else {}
                )  # BasicBlock has no 1×1 conv1 — "all" is meaningless there
                x = block_cls(
                    filters=filters,
                    norm=norm,
                    strides=s,
                    dilation=prev_dilation if block == 0 else dilation,
                    downsample=needs_down,
                    fold_cfg=fold_cfg,
                    name=f"layer{stage + 1}_{block}",
                    **extra,
                )(x)
        return x


ResNet18 = functools.partial(ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock)
ResNet34 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock)
ResNet50 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck)
ResNet101 = functools.partial(ResNet, stage_sizes=[3, 4, 23, 3], block_cls=Bottleneck)
ResNet152 = functools.partial(ResNet, stage_sizes=[3, 8, 36, 3], block_cls=Bottleneck)
# SimCLR-style width multipliers (Chen et al. 2020, ResNet50-{2x,4x}): conv
# FLOPs scale ~width², activation traffic ~width — arithmetic intensity grows
# ~width, which makes these the compute-bound MXU positive-control configs
# (tools/roofline_model.py ResNet50w2/w4: 71%/82% composite-floor MXU ceiling
# vs 49% for ResNet50 at b=128@224 on v5e)
ResNet50w2 = functools.partial(
    ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck, num_filters=128)
ResNet50w4 = functools.partial(
    ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck, num_filters=256)

# Dense-feature variants for SiamFC tracking: stride→dilation in layer3/4
# (reference backbone_models.py:78-89 ResNet18SiamFCDilated / ResNet50SiamFCDilated)
ResNet18SiamFCDilated = functools.partial(
    ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock,
    replace_stride_with_dilation=(False, True, True),
)
ResNet50SiamFCDilated = functools.partial(
    ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck,
    replace_stride_with_dilation=(False, True, True),
)
