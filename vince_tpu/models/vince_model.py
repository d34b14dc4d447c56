"""VINCE encoder — query/key network with projection and auxiliary heads.

Capability parity with reference ``models/vince_model.py`` (VinceModel /
VinceQueueModel), re-architected functionally for JAX:

  - backbone truncated to spatial features (``vince_model.py:26``), pooling by
    global average or attention (``:30-33``), MLP projection + L2 normalize
    (``:38-42,177-182``), jigsaw (PIRL) heads (``:43-49,144-171``), optional
    supervised ImageNet decoders (1-layer + 2-layer, ``:79-90``).
  - The momentum ("queue") encoder (reference VinceQueueModel,
    ``vince_model.py:573-613``) is not a second module: it is a second *param
    pytree* for the same module, updated by ``vince_tpu.ops.ema.ema_update``
    over the ``vince_params`` subset (reference ``vince_parameters()``,
    ``:96-104`` — backbone + pool + projection [+ jigsaw], excluding the
    supervised decoders).
  - Batch-shuffled BN (``:137-142,184-192``) is a *cross-device* permutation in
    the data-parallel train step (see solvers/vince_solver.py) — the
    DataParallel-randperm trick generalized to a mesh.

The similarity/loss math lives in ``vince_tpu.ops.infonce`` (pure functions);
this module only produces embeddings.
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vince_tpu.models import heads
from vince_tpu.models.backbones import get_backbone

# Parameter-subset names covered by the EMA momentum update
# (reference vince_parameters(), vince_model.py:96-104).
VINCE_PARAM_KEYS = ("backbone", "pool", "embedding", "jigsaw")


class VinceEncoder(nn.Module):
    backbone_name: str = "ResNet18"
    embed_size: int = 64
    use_attention: bool = False
    jigsaw: bool = False
    use_imagenet_decoders: bool = False
    num_imagenet_classes: int = 1000
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None  # None → per-device BN stats (MoCo-style)
    norm_kind: str = "batchnorm"  # {"batchnorm", "groupnorm"}
    remat: bool = False  # rematerialize residual blocks (HBM traffic ↓, FLOPs ↑)
    stem_kind: str = "conv7"  # "s2d" = space-to-depth stem (same math, faster)
    # {"none","expand","all"}: fold BN batch stats into the 1×1 dots via
    # derived input moments (same math/params; kills the pre-norm HBM trip)
    bn_fold: str = "none"
    # Pallas fused bn2→relu→conv3 kernel at folded bottleneck sites (ResNet)
    fold_kernel: bool = False
    # EfficientNet depthwise-conv emission: {"conv", "tap"} (see
    # efficientnet.DepthwiseConvTap — tap = k² elementwise FMAs, loop-fusable)
    dw_kind: str = "conv"
    # EfficientNet SE application: {"mul", "fold"} (efficientnet.Conv1x1SEFold
    # — fold the per-sample gate into the project conv's batched weights)
    se_kind: str = "mul"

    def setup(self):
        backbone_cls = get_backbone(self.backbone_name)
        kwargs = {"remat": self.remat, "bn_fold": self.bn_fold}
        if "ResNet" in self.backbone_name:
            kwargs["norm_kind"] = self.norm_kind
            kwargs["stem_kind"] = self.stem_kind  # ResNet-only (7x7 stem)
            kwargs["fold_kernel"] = self.fold_kernel
        if "EfficientNet" in self.backbone_name:
            kwargs["dw_kind"] = self.dw_kind
            kwargs["se_kind"] = self.se_kind
        self.backbone = backbone_cls(
            dtype=self.dtype, axis_name=self.bn_axis_name, name="backbone", **kwargs
        )
        self.output_channels = self.backbone.output_channels
        if self.use_attention:
            self.pool = heads.AttentionPool2D(name="pool")
        else:
            self.pool = heads.AveragePool(name="pool")
        self.embedding = heads.ProjectionMLP(self.embed_size, name="embedding")
        if self.jigsaw:
            self.jigsaw_head = heads.JigsawHeads(self.embed_size, name="jigsaw")
        if self.use_imagenet_decoders:
            # reference vince_model.py:79-90 — a linear and a 2-layer decoder
            self.imagenet_decoder_0 = heads.MultiLayerLinear(
                self.num_imagenet_classes, (), name="imagenet_decoder_0"
            )
            self.imagenet_decoder_1 = heads.MultiLayerLinear(
                self.num_imagenet_classes, (self.output_channels,), name="imagenet_decoder_1"
            )

    def extract_features(self, images, train: bool = True):
        """Spatial + pooled features (reference ``extract_features``,
        vince_model.py:123-133). images: [N, H, W, C] float."""
        spatial = self.backbone(images, train=train)
        pooled, attention_masks = self.pool(spatial)
        out = {"spatial_features": spatial, "extracted_features": pooled}
        if attention_masks is not None:
            out["attention_masks"] = attention_masks
        return out

    def __call__(
        self,
        images,
        train: bool = True,
        jigsaw: bool = False,
        jigsaw_perm: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Embedding forward (reference ``get_embeddings``, vince_model.py:135-196).

        For jigsaw, ``images`` must already be patched to [N*9, h, w, C] (use
        ``jigsaw_patchify``) and ``jigsaw_perm`` is [N, 9] int32.
        """
        out = self.extract_features(images, train=train)
        features = out["extracted_features"]
        if jigsaw:
            assert self.jigsaw and jigsaw_perm is not None
            patch_features = features.reshape(-1, 9, features.shape[-1])
            prenorm = self.jigsaw_head(patch_features, jigsaw_perm)
            out["extracted_features"] = prenorm
        else:
            prenorm = self.embedding(features)
        out["prenorm_features"] = prenorm
        norm = jnp.linalg.norm(prenorm.astype(jnp.float32), axis=-1, keepdims=True)
        out["embeddings"] = (prenorm / jnp.maximum(norm, 1e-12)).astype(prenorm.dtype)
        return out

    def imagenet_logits(self, features) -> Tuple[jax.Array, jax.Array]:
        """Supervised decoder logits on detached features (reference
        vince_model.py:244-248; the stop_gradient happens at the call site)."""
        return self.imagenet_decoder_0(features), self.imagenet_decoder_1(features)

    def full_init(self, images, train: bool = True):
        """Initialization entry that touches every head (flax only creates
        params for modules that run). Use ``model.init(rng, x,
        method=VinceEncoder.full_init)`` when decoders/jigsaw are enabled."""
        out = self(images, train=train)
        if self.use_imagenet_decoders:
            self.imagenet_logits(out["extracted_features"])
        if self.jigsaw:
            n = images.shape[0] // 9 if images.shape[0] % 9 == 0 else 1
            feats = jnp.zeros((n, 9, self.output_channels), self.dtype)
            perm = jnp.tile(jnp.arange(9)[None], (n, 1))
            self.jigsaw_head(feats, perm)
        return out


def jigsaw_patchify(images: jax.Array) -> jax.Array:
    """[N, H, W, C] → [N*9, ceil(H/3), ceil(W/3), C] 3×3 patch grid
    (reference vince_model.py:144-155, incl. the pad-to-multiple-of-3)."""
    n, h, w, c = images.shape
    ph, pw = (3 - h % 3) % 3, (3 - w % 3) % 3
    if ph or pw:
        images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    x = images.reshape(n, 3, h // 3, 3, w // 3, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [N, 3, 3, h/3, w/3, C]
    return x.reshape(n * 9, h // 3, w // 3, c)


def random_jigsaw_perms(rng: jax.Array, n: int) -> jax.Array:
    """Per-sample independent 9-permutations (reference vince_model.py:166)."""
    return jax.vmap(lambda k: jax.random.permutation(k, 9))(jax.random.split(rng, n))


def split_vince_params(params: Dict) -> Tuple[Dict, Dict]:
    """Split a VinceEncoder param tree into (EMA-tracked subset, rest) —
    the functional form of reference ``vince_parameters()`` vs other params."""
    tracked, rest = {}, {}
    for k, v in params.items():
        if any(k == key or k.startswith(key) for key in VINCE_PARAM_KEYS):
            tracked[k] = v
        else:
            rest[k] = v
    return tracked, rest


def merge_params(tracked: Dict, rest: Dict) -> Dict:
    out = dict(tracked)
    out.update(rest)
    return out
