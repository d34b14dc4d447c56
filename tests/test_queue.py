"""Ring-queue semantics: wraparound parity with reference storage_queue.py:31-49."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.ops.queue import dequeue, enqueue, init_queue


def _naive_enqueue(bank, tail, items):
    """Oracle: the reference's recursive two-part copy (storage_queue.py:35-49)."""
    bank = bank.copy()
    k = bank.shape[0]
    n = items.shape[0]
    if tail + n > k:
        num_start = k - tail
        if num_start > 0:
            bank[tail:] = items[:num_start]
        bank, tail = _naive_enqueue(bank, 0, items[num_start:])
    else:
        bank[tail : tail + n] = items
        tail = (tail + n) % k
    return bank, tail


def test_init_normalized():
    q = init_queue(jax.random.PRNGKey(0), 64, 16)
    norms = jnp.linalg.norm(q.vectors, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    assert not bool(q.full)
    assert int(q.tail) == 0


def test_enqueue_wraparound_matches_reference_semantics():
    rng = np.random.RandomState(0)
    k, d = 32, 8
    q = init_queue(jax.random.PRNGKey(1), k, d)
    bank = np.asarray(q.vectors).copy()
    tail = 0
    for step, b in enumerate([5, 7, 20, 31, 3, 32]):
        items = rng.randn(b, d).astype(np.float32)
        q = enqueue(q, jnp.asarray(items), source=step)
        bank, tail = _naive_enqueue(bank, tail, items)
        np.testing.assert_allclose(np.asarray(q.vectors), bank, rtol=1e-6)
        assert int(q.tail) == tail, (step, int(q.tail), tail)
    assert bool(q.full)


def test_sources_tracked():
    q = init_queue(jax.random.PRNGKey(2), 8, 4)
    q = enqueue(q, jnp.ones((3, 4)), source=7)
    src = np.asarray(q.sources)
    assert (src[:3] == 7).all() and (src[3:] == -1).all()


def test_dequeue_full_bank():
    q = init_queue(jax.random.PRNGKey(3), 16, 4)
    out = dequeue(q)
    assert out["queue_vectors"].shape == (16, 4)
    assert out["queue_data_sources"].shape == (16,)


def test_enqueue_jit_and_donation():
    q = init_queue(jax.random.PRNGKey(4), 128, 16)

    @jax.jit
    def step(state, items):
        return enqueue(state, items)

    items = jnp.ones((32, 16))
    for _ in range(5):
        q = step(q, items)
    # total saturates at K (int32 overflow guard) — 5*32=160 inserts cap at 128
    assert int(q.total) == 128 and bool(q.full)
    assert int(q.tail) == 32  # tail keeps wrapping past saturation
