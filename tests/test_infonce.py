"""Multi-positive InfoNCE parity vs a naive oracle implementing the reference
loss_util.py:7-62 semantics (both the boolean-gather and float-mask paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.ops.infonce import (
    cosine_sim_stats,
    infonce_from_embeddings,
    moco_mask,
    multi_frame_mask,
    multi_pair_infonce,
    nce_accuracy,
)


def naive_multi_pair_infonce(similarities, mask, temperature):
    """Oracle: literal translation of the math (not the code) of
    reference loss_util.py:40-44 using python loops."""
    logits = similarities / temperature
    b, n = logits.shape
    dists, weights = [], []
    for i in range(b):
        row = logits[i] - logits[i].max()
        negs = row[~mask[i]]
        denom_neg = np.exp(negs).sum()
        for j in np.where(mask[i])[0]:
            p = row[j]
            ls = p - np.log(np.exp(p) + denom_neg)
            dists.append(-ls)
            weights.append(np.exp(ls))
    return float(np.mean(dists)), float(np.mean(weights))


def _rand_sims(rng, b, n):
    return rng.randn(b, n).astype(np.float32)


def test_matches_oracle_single_positive():
    rng = np.random.RandomState(0)
    sims = _rand_sims(rng, 16, 64)
    mask = np.asarray(moco_mask(16, 63))
    out = multi_pair_infonce(jnp.asarray(sims), jnp.asarray(mask), 0.07)
    loss, weight = naive_multi_pair_infonce(sims, mask, 0.07)
    np.testing.assert_allclose(float(out["dist"]), loss, rtol=1e-5)
    np.testing.assert_allclose(float(out["softmax_weight"]), weight, rtol=1e-5)


def test_matches_oracle_multi_frame():
    rng = np.random.RandomState(1)
    b, nf, k = 12, 4, 40
    sims = _rand_sims(rng, b, b + k)
    mask = np.asarray(multi_frame_mask(b, nf, k))
    assert mask[:, :b].sum() == b * nf and mask[:, b:].sum() == 0
    out = multi_pair_infonce(jnp.asarray(sims), jnp.asarray(mask), 0.07)
    loss, weight = naive_multi_pair_infonce(sims, mask, 0.07)
    np.testing.assert_allclose(float(out["dist"]), loss, rtol=1e-5)
    np.testing.assert_allclose(float(out["softmax_weight"]), weight, rtol=1e-5)


def test_matches_oracle_ragged_mask():
    """The reference USE_FLOAT path: rows with different positive counts."""
    rng = np.random.RandomState(2)
    b, n = 8, 32
    sims = _rand_sims(rng, b, n)
    mask = np.zeros((b, n), dtype=bool)
    for i in range(b):
        mask[i, rng.choice(n, size=rng.randint(1, 5), replace=False)] = True
    out = multi_pair_infonce(jnp.asarray(sims), jnp.asarray(mask), 0.2)
    loss, weight = naive_multi_pair_infonce(sims, mask, 0.2)
    np.testing.assert_allclose(float(out["dist"]), loss, rtol=1e-5)
    np.testing.assert_allclose(float(out["softmax_weight"]), weight, rtol=1e-5)


def test_perfect_separation_low_loss():
    b, k = 8, 128
    sims = np.full((b, b + k), -1.0, dtype=np.float32)
    np.fill_diagonal(sims[:, :b], 1.0)
    mask = np.asarray(multi_frame_mask(b, 1, k))
    out = multi_pair_infonce(jnp.asarray(sims), jnp.asarray(mask), 0.07)
    assert float(out["dist"]) < 1e-3
    assert float(nce_accuracy(jnp.asarray(sims), jnp.asarray(mask))) == 1.0


def test_gradients_flow_only_through_unmasked_path():
    rng = np.random.RandomState(3)
    q = rng.randn(8, 16).astype(np.float32)
    kb = rng.randn(8, 16).astype(np.float32)
    queue = rng.randn(32, 16).astype(np.float32)

    def loss_fn(q):
        qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        out = infonce_from_embeddings(qn, jnp.asarray(kb), jnp.asarray(queue), 0.07, num_frames=2)
        return out["dist"]

    g = jax.grad(loss_fn)(jnp.asarray(q))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_moco_vs_interbatch_paths():
    rng = np.random.RandomState(4)
    q = rng.randn(8, 16).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k = rng.randn(8, 16).astype(np.float32)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    queue = rng.randn(64, 16).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=-1, keepdims=True)

    inter = infonce_from_embeddings(jnp.asarray(q), jnp.asarray(k), jnp.asarray(queue), 0.07, num_frames=1)
    moco = infonce_from_embeddings(jnp.asarray(q), jnp.asarray(k), jnp.asarray(queue), 0.07, inter_batch=False)
    assert inter["similarities"].shape == (8, 8 + 64)
    assert moco["similarities"].shape == (8, 1 + 64)
    for out in (inter, moco):
        assert np.isfinite(float(out["dist"]))


def test_cosine_stats():
    sims = jnp.asarray([[0.9, 0.1, -0.5], [0.2, 0.8, 0.0]], jnp.float32)
    mask = jnp.asarray([[True, False, False], [False, True, False]])
    stats = cosine_sim_stats(sims, mask)
    np.testing.assert_allclose(float(stats["cosine_sim"]), (0.9 + 0.8) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(stats["cosine_sim_neg_max"]), (0.1 + 0.2) / 2, rtol=1e-6)


def test_ema_update():
    from vince_tpu.ops.ema import ema_update

    key = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    query = {"w": jnp.zeros((4, 4)), "b": jnp.ones((4,))}
    out = ema_update(key, query, 0.999)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.999, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.001, rtol=1e-4)
