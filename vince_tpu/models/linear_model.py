"""Probe decoder bundles.

Parity with reference ``models/linear_model.py``: ``MultiLinearModel`` bundles
several classifier heads of different depths over the same frozen features —
the reference end tasks use a 1-layer (linear probe) and a 2-layer MLP head
(``end_task_classifier_solver.py:18-28``), each with its own CE loss and
accuracy metric (``linear_model.py:73-100``).
"""

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from vince_tpu.models.heads import MultiLayerLinear


class MultiLinearModel(nn.Module):
    """heads[m] is an m-hidden-layer... reference semantics: depth list [1, 2]
    means a 1-layer (linear) and a 2-layer (one hidden) classifier."""

    num_classes: int
    depths: Tuple[int, ...] = (1, 2)

    @nn.compact
    def __call__(self, features) -> Tuple[jax.Array, ...]:
        outs = []
        for i, d in enumerate(self.depths):
            hidden = tuple([features.shape[-1]] * (d - 1))
            outs.append(
                MultiLayerLinear(self.num_classes, hidden, name=f"classifier_{i}")(features)
            )
        return tuple(outs)


def classifier_losses(
    logits_tuple: Tuple[jax.Array, ...], labels: jax.Array, reduce: bool = True
) -> Dict[str, jax.Array]:
    """Per-head CE loss + accuracy (reference linear_model.py:73-100).

    ``reduce=False`` returns per-sample ``[B]`` arrays instead of batch means
    (used by the full-epoch val pass to weight a padded final batch exactly).
    """
    out = {}
    for i, logits in enumerate(logits_tuple):
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
        acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        out[f"loss/classifier_loss_{i}"] = ce.mean() if reduce else ce
        out[f"classifier_accuracy_{i}"] = acc.mean() if reduce else acc
    return out
