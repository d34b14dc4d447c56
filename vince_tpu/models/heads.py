"""Pooling and projection heads.

  - ``AveragePool`` / ``AttentionPool2D``: the reference's two pooling choices
    (``vince_model.py:30-33``; AttentionPool2D is a ``dg_util`` module —
    SURVEY.md §2.9 — re-derived as softmax spatial attention returning masks).
  - ``ProjectionMLP``: Linear→ReLU→Linear(embed) head (``vince_model.py:38-42``).
  - ``JigsawHeads``: per-patch linear + 9-patch concat MLP for the PIRL variant
    (``vince_model.py:43-49``).
  - ``MultiLayerLinear``: parameterized MLP stack backing the probes
    (reference ``models/linear_model.py``).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class AveragePool(nn.Module):
    """Global average pool over H, W (reference ``vince_model.py:33``)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, Optional[jax.Array]]:
        return jnp.mean(x, axis=(1, 2)), None


class AttentionPool2D(nn.Module):
    """Softmax spatial attention pooling returning per-pixel masks for the
    visualization panels (reference ``vince_model.py:31`` + attention overlay
    ``vince_model.py:522-568``)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        n, h, w, c = x.shape
        logits = nn.Conv(1, (1, 1), name="attn_logits")(x)  # [N, H, W, 1]
        weights = jax.nn.softmax(logits.reshape(n, h * w, 1), axis=1)
        pooled = jnp.sum(x.reshape(n, h * w, c) * weights, axis=1)
        return pooled, weights.reshape(n, h, w, 1)


class ProjectionMLP(nn.Module):
    """Linear→ReLU→Linear projection to the contrastive embedding
    (reference ``vince_model.py:38-42``; MoCoV2's MLP head)."""

    embed_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(x.shape[-1], name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_size, name="fc2")(x)


class JigsawHeads(nn.Module):
    """PIRL-style jigsaw head: per-patch linear, shuffle-invariant 9-patch
    concat, MLP to embedding (reference ``vince_model.py:43-49,161-172``)."""

    embed_size: int

    @nn.compact
    def __call__(self, patch_features: jax.Array, perm: jax.Array):
        """patch_features: [N, 9, C]; perm: [N, 9] int32 per-sample orders."""
        n, p, c = patch_features.shape
        x = nn.Dense(c, name="jigsaw_linear")(patch_features)
        x = jnp.take_along_axis(x, perm[:, :, None], axis=1)  # vince_model.py:166-169
        x = x.reshape(n, p * c)
        x = nn.Dense(c, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_size, name="fc2")(x)


class MultiLayerLinear(nn.Module):
    """MLP with ``sizes`` hidden layers — reference ``linear_model.py``'s
    MultiLayerLinearModel (0 hidden = linear probe; 1 hidden = 2-layer MLP)."""

    out_size: int
    hidden_sizes: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_size, name="fc_out")(x)
