"""Cross-device collective helpers (parallel/collectives.py): the balanced
all_to_all shuffled-BN path must be bit-equal to the all_gather path's
semantics — a2a output == gather_global_batch(x)[perm]'s local slice, and
cross_device_unshuffle(perm) round-trips both modes identically."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from vince_tpu.parallel.collectives import (
    cross_device_shuffle,
    cross_device_shuffle_a2a,
    cross_device_unshuffle,
    gather_global_batch,
    make_balanced_shuffle_perm,
    make_shuffle_perm,
)
from vince_tpu.parallel.mesh import DATA_AXIS, MeshSpec, make_mesh


def _run_sharded(mesh, fn, *args, in_specs, out_specs):
    f = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False))
    return f(*args)


def test_balanced_perm_is_permutation(cpu_devices):
    perm, sigma, tau = make_balanced_shuffle_perm(jax.random.PRNGKey(0), 64, 8)
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(64))
    # each destination block of 8 receives exactly 1 row from every source
    src_of = p // 8
    for i in range(8):
        counts = np.bincount(src_of[i * 8:(i + 1) * 8], minlength=8)
        np.testing.assert_array_equal(counts, np.ones(8, np.int64))


def test_a2a_equals_gather_perm_slice(cpu_devices):
    """a2a shuffle == x_global[perm] local slice (the ADVICE.md contract)."""
    mesh = make_mesh(MeshSpec(8, 1))
    x = jnp.arange(64 * 3, dtype=jnp.float32).reshape(64, 3)
    perm, sigma, tau = make_balanced_shuffle_perm(jax.random.PRNGKey(1), 64, 8)

    def local(xl):
        return cross_device_shuffle_a2a(xl, sigma, tau)

    got = _run_sharded(mesh, local, x, in_specs=(P(DATA_AXIS),),
                       out_specs=P(DATA_AXIS))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(perm)])


def test_a2a_unshuffle_round_trip(cpu_devices):
    """unshuffle(shuffle_a2a(x), perm) == global x, same as the gather mode."""
    mesh = make_mesh(MeshSpec(8, 1))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64, 5).astype(np.float32))
    perm, sigma, tau = make_balanced_shuffle_perm(jax.random.PRNGKey(3), 64, 8)

    def local_a2a(xl):
        y = cross_device_shuffle_a2a(xl, sigma, tau)
        return cross_device_unshuffle(y, perm)

    def local_gather(xl):
        y = cross_device_shuffle(xl, perm)
        return cross_device_unshuffle(y, perm)

    a2a = _run_sharded(mesh, local_a2a, x, in_specs=(P(DATA_AXIS),), out_specs=P())
    gat = _run_sharded(mesh, local_gather, x, in_specs=(P(DATA_AXIS),), out_specs=P())
    np.testing.assert_array_equal(np.asarray(a2a), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(a2a), np.asarray(gat))


def test_gather_shuffle_matches_perm_slice(cpu_devices):
    mesh = make_mesh(MeshSpec(8, 1))
    x = jnp.arange(64, dtype=jnp.float32).reshape(64, 1)
    perm = make_shuffle_perm(jax.random.PRNGKey(4), 64)

    def local(xl):
        return cross_device_shuffle(xl, perm)

    got = _run_sharded(mesh, local, x, in_specs=(P(DATA_AXIS),),
                       out_specs=P(DATA_AXIS))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(perm)])


def test_vince_step_a2a_mode_matches_gather_keys(cpu_devices):
    """With groupnorm (no cross-sample stats), the shuffled-BN scatter is
    semantically a no-op: the enqueued global keys must be identical under
    shuffle_mode='gather', 'a2a', and shuffle off — so the a2a wiring in
    vince_step is proven equivalent end-to-end, not just at the collective."""
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
    )

    opt = optax.sgd(0.01)
    rng = np.random.RandomState(5)
    data = rng.randint(0, 256, (32, 36, 36, 3), np.uint8)
    vecs_by_mode = {}
    for mode, shuffle_bn in (("gather", True), ("a2a", True), ("off", False)):
        cfg = VinceConfig(
            sources=(SourceSpec("YT", batch_size=32, num_frames=2, source_id=1),),
            backbone="ResNet18", embed_size=16, image_size=32, queue_size=64,
            data_axis_size=4, queue_axis_size=2,
            shuffle_bn=shuffle_bn,
            shuffle_mode=mode if mode != "off" else "gather",
            norm_kind="groupnorm",
        )
        mesh = make_mesh(MeshSpec(4, 2))
        state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
        step = make_train_step(cfg, opt, mesh)
        batch = ({"data": jnp.asarray(data), "queue_data": jnp.asarray(data)},)
        state, metrics = step(state, batch, jax.random.PRNGKey(6))
        assert np.isfinite(float(metrics["loss/total_loss"]))
        vecs_by_mode[mode] = np.asarray(jax.device_get(state.queue.vectors))[:32]
    np.testing.assert_allclose(vecs_by_mode["a2a"], vecs_by_mode["gather"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vecs_by_mode["a2a"], vecs_by_mode["off"],
                               rtol=1e-5, atol=1e-6)


def test_a2a_mode_rejects_indivisible_batch(cpu_devices):
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, make_train_step_fn,
    )

    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=16, num_frames=1, source_id=1),),
        backbone="ResNet18", embed_size=16, image_size=32, queue_size=64,
        data_axis_size=8, queue_axis_size=1, shuffle_mode="a2a",
    )  # per-device batch 2, data axis 8 → 2 % 8 != 0
    mesh = make_mesh(MeshSpec(8, 1))
    with pytest.raises(ValueError, match="a2a"):
        make_train_step_fn(cfg, optax.sgd(0.01), mesh)
