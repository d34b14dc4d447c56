"""Queue-sharded multi-positive InfoNCE with a streaming (flash-style)
softmax combine over the ``queue`` mesh axis.

This is the scale path for negative-set growth (SURVEY.md §5.7): the memory
bank is sharded over the ``queue`` axis; each device computes partial
``q·Kᵀ`` logits against its shard, and the softmax denominator is combined
with a pmax/psum pair — the ring-attention-shaped pattern applied to
contrastive scoring. Numerics match ``vince_tpu.ops.infonce.multi_pair_infonce``
(reference ``loss_util.py:7-62`` semantics) exactly: same row-max subtraction,
same per-positive denominators (other positives excluded).

With ``queue_axis=None`` this degenerates to the single-device computation and
is tested for bit-parity against the reference-semantics implementation.

Gradient correctness under SPMD: callers must scale the per-device loss by
1/queue_axis_size and psum gradients over the queue axis (see
``solvers/vince_step.py``) — the psum-transpose then sums per-shard cotangents
back to exactly one logical gradient.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -(2.0 ** 30)


def sharded_multi_pair_infonce(
    q_local: jax.Array,  # [b, D] local query embeddings (repl. over queue axis)
    k_global: jax.Array,  # [Bg, D] global key embeddings (repl. over queue axis)
    pos_mask: jax.Array,  # [b, Bg] bool — positives within the key block
    temperature: float,
    queue_shard: Optional[jax.Array] = None,  # [Ks, D] this device's queue shard
    queue_axis: Optional[str] = None,  # mesh axis the queue is sharded over
    batch_neg_mask: Optional[jax.Array] = None,  # [b, Bg] bool — batch entries
    # counted as negatives; default = ~pos_mask (inter-batch comparison). The
    # MoCo path (reference vince_model.py:227-233) passes all-False: batch
    # keys are positives only, negatives come solely from the queue.
    use_fused_queue_kernel: bool = False,  # Pallas streaming kernel for the
    # queue sweep (ops/pallas/infonce_kernel.py) — never materializes [b, K]
) -> Dict[str, jax.Array]:
    """Returns per-local-row loss/metric aggregates (caller pmeans over data)."""
    maskf = pos_mask.astype(jnp.float32)
    if batch_neg_mask is None:
        inv_maskf = 1.0 - maskf
    else:
        inv_maskf = batch_neg_mask.astype(jnp.float32)

    sims_batch = jnp.dot(q_local, k_global.T, preferred_element_type=jnp.float32)
    logits_batch = sims_batch / temperature

    queue_kernel_partials = None
    if queue_shard is not None and use_fused_queue_kernel:
        from vince_tpu.ops.pallas.infonce_kernel import queue_logsumexp

        m_loc, s_loc = queue_logsumexp(q_local, queue_shard, temperature)
        queue_kernel_partials = (m_loc[:, None], s_loc[:, None])
        # the kernel's custom VJP discards dm, but m itself is NOT detached
        # in the forward — stop_gradient before pmax (no differentiation rule)
        m_queue = lax.stop_gradient(queue_kernel_partials[0])
        s_queue_max_raw = m_queue * temperature
        if queue_axis is not None:
            m_queue = lax.pmax(m_queue, queue_axis)
            s_queue_max_raw = lax.pmax(s_queue_max_raw, queue_axis)
    elif queue_shard is not None:
        sims_queue = jnp.dot(q_local, queue_shard.T, preferred_element_type=jnp.float32)
        logits_queue = sims_queue / temperature
        # maxes feed only the (stop-gradient) stabilizer and metrics — detach
        # before pmax, which has no differentiation rule
        m_queue = lax.stop_gradient(jnp.max(logits_queue, axis=-1, keepdims=True))
        s_queue_max_raw = lax.stop_gradient(jnp.max(sims_queue, axis=-1, keepdims=True))
        if queue_axis is not None:
            m_queue = lax.pmax(m_queue, queue_axis)
            s_queue_max_raw = lax.pmax(s_queue_max_raw, queue_axis)
    else:
        m_queue = jnp.full((q_local.shape[0], 1), NEG_INF)
        s_queue_max_raw = jnp.full((q_local.shape[0], 1), NEG_INF)

    # Row max over the full row (positives included) — loss_util.py:24 parity.
    m_batch = jnp.max(logits_batch, axis=-1, keepdims=True)
    row_max = lax.stop_gradient(jnp.maximum(m_batch, m_queue))

    scaled_batch = logits_batch - row_max
    neg_batch_sum = jnp.sum(jnp.exp(scaled_batch) * inv_maskf, axis=-1, keepdims=True)

    if queue_kernel_partials is not None:
        m_loc, s_loc = queue_kernel_partials
        # exp(m−M)·S is invariant to m, so routing the gradient only through S
        # (the kernel's custom VJP) is exact
        q_exp_local = jnp.exp(m_loc - row_max) * s_loc
        neg_queue_sum = lax.psum(q_exp_local, queue_axis) if queue_axis else q_exp_local
    elif queue_shard is not None:
        q_exp_local = jnp.sum(jnp.exp(logits_queue - row_max), axis=-1, keepdims=True)
        neg_queue_sum = lax.psum(q_exp_local, queue_axis) if queue_axis else q_exp_local
    else:
        neg_queue_sum = jnp.zeros_like(neg_batch_sum)

    neg_sum = neg_batch_sum + neg_queue_sum

    pos = jnp.where(pos_mask, scaled_batch, NEG_INF)
    log_softmax = pos - jnp.log(jnp.exp(pos) + neg_sum)
    dists = -log_softmax

    n_pos = jnp.maximum(jnp.sum(maskf), 1.0)
    dist = jnp.sum(dists * maskf) / n_pos
    softmax_weights = lax.stop_gradient(jnp.exp(log_softmax)) * maskf
    softmax_weight = jnp.sum(softmax_weights) / n_pos

    # ---- metrics on raw (un-scaled) similarities, vince_model.py:314-342 ----
    neg_batch_max_raw = jnp.max(
        jnp.where(inv_maskf > 0, sims_batch, NEG_INF), axis=-1, keepdims=True
    )
    neg_max_raw = jnp.maximum(neg_batch_max_raw, s_queue_max_raw)
    correct = (sims_batch > neg_max_raw) & pos_mask
    nce_accuracy = jnp.sum(correct.astype(jnp.float32)) / n_pos
    cosine_sim = jnp.sum(sims_batch * maskf) / n_pos
    cosine_sim_neg_max = jnp.mean(neg_max_raw)

    return {
        "dist": dist,
        "softmax_weight": softmax_weight,
        "nce_accuracy": nce_accuracy,
        "cosine_sim": cosine_sim,
        "cosine_sim_neg_max": cosine_sim_neg_max,
    }
