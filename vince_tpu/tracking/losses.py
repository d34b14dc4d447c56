"""SiamFC response-map losses.

Parity with reference ``siamfc_pytorch/losses.py``: BalancedLoss
(inverse-frequency-weighted BCE, :22-36), **FocalLoss** (the one actually
used, gamma=2, numerically-stable log-sigmoid pair, :39-57), GHMC
gradient-harmonizing (:60-95, with its running bin statistics made explicit
functional state), and OHNM hard-negative mining (:98-119 — the data-dependent
top-k becomes a fixed-k masked top-k so it stays jittable).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def log_sigmoid(x):
    return jnp.clip(x, a_max=0) - jnp.log1p(jnp.exp(-jnp.abs(x)))


def log_minus_sigmoid(x):
    return jnp.clip(-x, a_max=0) - jnp.log1p(jnp.exp(-jnp.abs(x)))


def balanced_loss(logits: jax.Array, target: jax.Array, neg_weight: float = 1.0) -> jax.Array:
    """NOTE: parity with the reference includes its pos/neg mask quirk
    (``losses.py:28-29`` maps target==0 → pos bucket, target==1 → neg) — the
    effective behavior is inverse-frequency weighting, which is symmetric."""
    target = target.astype(jnp.float32)
    pos_mask = target == 0
    neg_mask = target == 1
    pos_num = jnp.maximum(pos_mask.sum(), 1).astype(jnp.float32)
    neg_num = jnp.maximum(neg_mask.sum(), 1).astype(jnp.float32)
    weight = pos_mask / pos_num + neg_mask / neg_num * neg_weight
    weight = weight / jnp.maximum(weight.sum(), 1e-12)
    bce = -(target * log_sigmoid(logits) + (1 - target) * log_minus_sigmoid(logits))
    return jnp.sum(bce * weight)


def focal_loss(
    logits: jax.Array, target: jax.Array, gamma: float = 2.0, reduce: bool = True
) -> jax.Array:
    """Reference losses.py:39-57 (incl. the mean-weight renormalization).

    ``reduce=False`` returns a per-sample ``[B]`` loss with the weight
    renormalization computed per sample instead of over the whole batch
    (full-epoch val weighting; differs from the batch loss only through the
    renorm constant).
    """
    target = target.astype(jnp.float32)
    pos_log_sig = log_sigmoid(logits)
    neg_log_sig = log_minus_sigmoid(logits)
    prob = jax.nn.sigmoid(logits)
    pos_weight = (1 - prob) ** gamma
    neg_weight = prob ** gamma
    loss = -(target * pos_weight * pos_log_sig + (1 - target) * neg_weight * neg_log_sig)
    avg_weight = target * pos_weight + (1 - target) * neg_weight
    if reduce:
        loss = loss / jnp.maximum(avg_weight.mean(), 1e-12)
        return loss.mean()
    axes = tuple(range(1, loss.ndim))
    per_sample = loss.mean(axes) / jnp.maximum(avg_weight.mean(axes), 1e-12)
    return per_sample


def ghmc_loss(
    logits: jax.Array,
    target: jax.Array,
    acc_sum: Optional[jax.Array] = None,
    bins: int = 30,
    momentum: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Gradient-harmonized BCE. The reference mutates ``self.acc_sum``
    (losses.py:85); here the running per-bin statistics are explicit state:
    returns (loss, new_acc_sum). Pass acc_sum=None to start at zero."""
    target = target.astype(jnp.float32)
    if acc_sum is None:
        acc_sum = jnp.zeros((bins,), jnp.float32)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(logits)) - target)
    edges = jnp.linspace(0.0, 1.0, bins + 1).at[-1].add(1e-6)
    bin_idx = jnp.clip(jnp.searchsorted(edges, g.reshape(-1), side="right") - 1, 0, bins - 1)
    counts = jnp.zeros((bins,)).at[bin_idx].add(1.0)
    tot = g.size
    if momentum > 0:
        new_acc = jnp.where(counts > 0, momentum * acc_sum + (1 - momentum) * counts, acc_sum)
        denom = new_acc
    else:
        new_acc = acc_sum
        denom = counts
    bin_w = jnp.where(counts > 0, tot / jnp.maximum(denom, 1e-12), 0.0)
    weights = bin_w[bin_idx].reshape(g.shape)
    # reference losses.py:91 — mean-normalize once (every sample lands in
    # some bin, so the mean is strictly positive)
    weights = weights / jnp.maximum(weights.mean(), 1e-12)
    bce = -(target * log_sigmoid(logits) + (1 - target) * log_minus_sigmoid(logits))
    loss = jnp.sum(bce * weights) / tot
    return loss, new_acc


def ohnm_loss(logits: jax.Array, target: jax.Array, neg_ratio: float = 3.0) -> jax.Array:
    """Online hard-negative mining: all positives + top-(ratio·P) negatives.
    The reference's dynamic top-k (losses.py:110-113) is realized as a masked
    sort with a rank threshold computed from the (traced) positive count —
    static shapes, identical selection."""
    target = target.astype(jnp.float32).reshape(-1)
    logits = logits.reshape(-1)
    pos_mask = target > 0
    pos_num = pos_mask.sum()
    neg_num = (pos_num * neg_ratio).astype(jnp.int32)
    neg_logits = jnp.where(target == 0, logits, -jnp.inf)
    order = jnp.argsort(-neg_logits)  # descending; hard negatives first
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.size))
    hard_neg_mask = (target == 0) & (ranks < neg_num)
    sel = pos_mask | hard_neg_mask
    bce = -(target * log_sigmoid(logits) + (1 - target) * log_minus_sigmoid(logits))
    return jnp.sum(bce * sel) / jnp.maximum(sel.sum(), 1.0)
