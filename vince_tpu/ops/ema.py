"""Momentum (EMA) encoder update as a pytree map.

Parity with reference ``models/vince_model.py:587-592``:
``θ_k ← m·θ_k + (1−m)·θ_q`` over the contrastive-encoder parameter subset
(``vince_parameters()``, reference ``vince_model.py:96-104`` — backbone +
pool + projection head, *not* the supervised decoders). In the functional
design the key encoder is its own pytree, so the subset selection happens at
state construction, and this update is a single fused elementwise kernel over
all leaves (donated in the jitted train step, so it is HBM-bandwidth-optimal).
"""

import jax


def ema_update(key_tree, query_tree, momentum: float):
    """θ_k ← m·θ_k + (1−m)·θ_q, leafwise; preserves key-tree dtypes."""

    def _upd(k, q):
        return (momentum * k + (1.0 - momentum) * q.astype(k.dtype)).astype(k.dtype)

    return jax.tree_util.tree_map(_upd, key_tree, query_tree)
