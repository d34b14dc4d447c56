"""Multi-positive ("multi-pair") InfoNCE — the contrastive core.

Behavioral parity with reference ``utils/loss_util.py:7-62``
(``similarity_cross_entropy``): temperature-scaled similarities, per-row max
subtraction for stability, and the *multi-pair* objective — every positive in a
row is scored against the row's shared negatives only:

    loss(i, j∈pos(i)) = −log( exp(s_ij) / (exp(s_ij) + Σ_{k∈neg(i)} exp(s_ik)) )

(other positives are excluded from each positive's denominator — this is the
VINCE generalization of InfoNCE, reference ``loss_util.py:40-44``). The
reference has two numerics paths (boolean gather vs the float ``−2^20`` mask
trick, ``loss_util.py:27-38``); both reduce to a mean over positive entries,
which is what the single masked implementation here computes. We use −2^30 as
the additive mask offset; after row-max subtraction ``exp`` of masked entries
underflows to exactly 0.0 in float32, matching the gather path bit-for-bit in
the cases the reference exercises.

Mask constructors mirror reference ``models/vince_model.py:50-77`` (multi-frame
block-diag over [B, B+K] similarities) and ``vince_model.py:227-233``
(MoCo-style first-column positives).

The fused Pallas path (q·Kᵀ + streaming masked softmax-CE over queue blocks,
never materializing [B, B+K] logits in HBM) lives in
``vince_tpu.ops.pallas.infonce_kernel`` and is numerically interchangeable —
``multi_pair_infonce`` is the reference semantics both are tested against.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

MASK_NEG = -(2.0 ** 30)


def multi_frame_mask(batch_size: int, num_frames: int, num_negatives: int) -> jnp.ndarray:
    """Block-diagonal positive mask for inter-batch multi-frame comparison.

    Rows = queries [B]; cols = [B keys | num_negatives queue entries]. Queries
    and keys from the same video (groups of ``num_frames``) are positives.
    Parity: reference ``vince_model.py:50-66`` (scipy block_diag + zero pad).
    """
    assert batch_size % num_frames == 0
    groups = jnp.arange(batch_size) // num_frames
    diag = groups[:, None] == groups[None, :]
    if num_negatives:
        diag = jnp.concatenate(
            [diag, jnp.zeros((batch_size, num_negatives), dtype=bool)], axis=1
        )
    return diag


def moco_mask(batch_size: int, num_negatives: int) -> jnp.ndarray:
    """MoCo-style mask: similarities are [l_pos | l_neg], positive = column 0
    (reference ``vince_model.py:227-233``)."""
    m = jnp.zeros((batch_size, 1 + num_negatives), dtype=bool)
    return m.at[:, 0].set(True)


def multi_pair_infonce(
    similarities: jax.Array,
    mask: jax.Array,
    temperature: float,
) -> Dict[str, jax.Array]:
    """Reference-semantics multi-positive InfoNCE.

    Args:
      similarities: [B, N] raw (un-scaled) cosine similarities.
      mask: [B, N] bool, True at positive entries. Every row must contain at
        least one positive and one negative.
      temperature: τ; logits = similarities / τ (reference ``loss_util.py:9``).

    Returns dict with (names match reference ``loss_util.py:54-62``):
      dists: [B, N] per-positive −log-softmax values (0 at non-positives).
      dist: scalar mean over positive entries — the loss.
      softmax_weights: [B, N] exp(log_softmax) at positives (stop-gradient).
      softmax_weight: scalar mean over positives.
    """
    logits = similarities / temperature
    mask = mask.astype(bool)
    row_max = jnp.max(logits, axis=-1, keepdims=True)  # loss_util.py:24
    scaled = logits - jax.lax.stop_gradient(row_max)

    neg = jnp.where(mask, MASK_NEG, scaled)
    pos = jnp.where(mask, scaled, MASK_NEG)

    neg_exp_sum = jnp.sum(jnp.exp(neg), axis=-1, keepdims=True)  # loss_util.py:40
    log_softmax = pos - jnp.log(jnp.exp(pos) + neg_exp_sum)  # loss_util.py:43
    dists = -log_softmax

    maskf = mask.astype(similarities.dtype)
    n_pos = jnp.maximum(jnp.sum(maskf), 1.0)
    dist = jnp.sum(dists * maskf) / n_pos  # loss_util.py:48 dists[mask].mean()
    softmax_weights = jax.lax.stop_gradient(jnp.exp(log_softmax)) * maskf
    softmax_weight = jnp.sum(softmax_weights) / n_pos

    return {
        "dists": dists * maskf,
        "dist": dist,
        "softmax_weights": softmax_weights,
        "softmax_weight": softmax_weight,
    }


def nce_accuracy(
    similarities: jax.Array, mask: jax.Array, per_row: bool = False
) -> jax.Array:
    """Fraction of positives scoring above the hardest negative in their row
    (reference ``vince_model.py:319-331`` metric semantics)."""
    mask = mask.astype(bool)
    neg_max = jnp.max(jnp.where(mask, MASK_NEG, similarities), axis=-1, keepdims=True)
    correct = (similarities > neg_max) & mask
    maskf = mask.astype(jnp.float32)
    if per_row:
        return jnp.sum(correct, axis=-1) / jnp.maximum(jnp.sum(maskf, axis=-1), 1.0)
    return jnp.sum(correct.astype(jnp.float32)) / jnp.maximum(jnp.sum(maskf), 1.0)


def cosine_sim_stats(similarities: jax.Array, mask: jax.Array) -> Dict[str, jax.Array]:
    """cosine_sim (mean positive similarity) and cosine_sim_neg_max metrics,
    reference ``vince_model.py:322-342``."""
    mask = mask.astype(bool)
    maskf = mask.astype(jnp.float32)
    pos_mean = jnp.sum(similarities * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
    neg_max = jnp.max(jnp.where(mask, MASK_NEG, similarities), axis=-1)
    return {"cosine_sim": pos_mean, "cosine_sim_neg_max": jnp.mean(neg_max)}


def infonce_from_embeddings(
    query: jax.Array,
    keys: jax.Array,
    queue_vectors: Optional[jax.Array],
    temperature: float,
    num_frames: int = 1,
    inter_batch: bool = True,
) -> Dict[str, jax.Array]:
    """Convenience wrapper: build similarities + mask the way the reference
    forward does (``vince_model.py:205-242``) and evaluate the loss.

    inter_batch=True:  sims = q · [keys; queue]ᵀ, block-diag multi-frame mask.
    inter_batch=False: sims = [per-row q·k | q·queueᵀ], first-column mask.
    """
    b = query.shape[0]
    if inter_batch:
        negs = keys if queue_vectors is None else jnp.concatenate([keys, queue_vectors], axis=0)
        sims = query @ negs.T  # vince_model.py:223-225 — one MXU matmul
        nq = 0 if queue_vectors is None else queue_vectors.shape[0]
        if num_frames > 1:
            mask = multi_frame_mask(b, num_frames, nq)
        else:
            mask = multi_frame_mask(b, 1, nq)  # eye mask, vince_model.py:68-77
    else:
        l_pos = jnp.sum(query * keys, axis=-1, keepdims=True)  # vince_model.py:227
        if queue_vectors is None:  # queue-less MoCo: positive column only
            sims = l_pos
            mask = moco_mask(b, 0)
        else:
            l_neg = query @ queue_vectors.T
            sims = jnp.concatenate([l_pos, l_neg], axis=1)
            mask = moco_mask(b, queue_vectors.shape[0])
    out = multi_pair_infonce(sims, mask, temperature)
    out["similarities"] = sims
    out["mask"] = mask
    return out
