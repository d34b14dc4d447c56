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
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """2×(3×3 conv) residual block — reference resnet.py:53-92."""

    filters: int
    norm: ModuleDef
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 1

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
        y = nn.Conv(
            self.filters,
            (3, 3),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            name="conv2",
        )(y)
        y = self.norm(name="bn2", scale_init=nn.initializers.zeros)(y)
        if self.downsample:
            residual = nn.Conv(
                self.filters * self.expansion,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
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

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
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
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3", scale_init=nn.initializers.zeros)(y)
        if self.downsample:
            residual = nn.Conv(
                self.filters * self.expansion,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
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
        x = x.astype(self.dtype)
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
            # reference resnet.py:176-186 — convert stride to dilation per stage
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
            for block in range(num_blocks):
                expansion = 4 if self.block_cls is Bottleneck else 1
                in_ch = x.shape[-1]
                s = stride if block == 0 else 1
                needs_down = s != 1 or in_ch != filters * expansion
                x = block_cls(
                    filters=filters,
                    norm=norm,
                    strides=s,
                    dilation=dilation,
                    downsample=needs_down,
                    name=f"layer{stage + 1}_{block}",
                )(x)
        return x


ResNet18 = functools.partial(ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock)
ResNet34 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock)
ResNet50 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=Bottleneck)
ResNet101 = functools.partial(ResNet, stage_sizes=[3, 4, 23, 3], block_cls=Bottleneck)
ResNet152 = functools.partial(ResNet, stage_sizes=[3, 8, 36, 3], block_cls=Bottleneck)

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
