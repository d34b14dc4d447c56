"""Fused Pallas queue-scoring kernel: value + gradient parity vs the XLA
reference (interpret mode on CPU; the real-TPU path is exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.ops.pallas.infonce_kernel import (
    _pallas_queue_logsumexp,
    _reference_queue_logsumexp,
    queue_logsumexp,
)
from vince_tpu.ops.sharded_infonce import sharded_multi_pair_infonce


def _data(b=16, d=128, k=1024, seed=0):
    rng = np.random.RandomState(seed)
    norm = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    q = jnp.asarray(norm(rng.randn(b, d).astype(np.float32)))
    queue = jnp.asarray(norm(rng.randn(k, d).astype(np.float32)))
    return q, queue


def test_kernel_interpret_matches_reference():
    q, queue = _data()
    m_ref, s_ref, w_ref = _reference_queue_logsumexp(q, queue, 0.07)
    m, s, w = _pallas_queue_logsumexp(q, queue, 0.07, 8, 256, interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_gradient_matches_autodiff():
    """dq through (m, S) must equal autodiff through the reference math."""
    q, queue = _data(b=8, d=64, k=256)

    def loss_via_kernel(q):
        m, s = queue_logsumexp(q, queue, 0.07)
        # typical downstream use: logsumexp-style objective
        return jnp.sum(jnp.log(s) + m)

    def loss_reference(q):
        logits = q @ queue.T / 0.07
        return jnp.sum(jax.nn.logsumexp(logits, axis=-1))

    v1, g1 = jax.value_and_grad(loss_via_kernel)(q)
    v2, g2 = jax.value_and_grad(loss_reference)(q)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)


def test_full_loss_parity_with_fused_flag():
    """sharded_multi_pair_infonce(use_fused_queue_kernel=True) must equal the
    direct path in value and q-gradient (XLA fallback path on CPU)."""
    rng = np.random.RandomState(1)
    b, d, k, nf = 8, 64, 512, 2
    norm = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    q = jnp.asarray(norm(rng.randn(b, d).astype(np.float32)))
    kb = jnp.asarray(norm(rng.randn(b, d).astype(np.float32)))
    queue = jnp.asarray(norm(rng.randn(k, d).astype(np.float32)))
    groups = np.arange(b) // nf
    mask = jnp.asarray(groups[:, None] == groups[None, :])

    def loss(qq, fused):
        return sharded_multi_pair_infonce(
            qq, kb, mask, 0.07, queue_shard=queue, use_fused_queue_kernel=fused
        )["dist"]

    v_direct, g_direct = jax.value_and_grad(lambda x: loss(x, False))(q)
    v_fused, g_fused = jax.value_and_grad(lambda x: loss(x, True))(q)
    np.testing.assert_allclose(float(v_fused), float(v_direct), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_direct), rtol=1e-4, atol=1e-6)
