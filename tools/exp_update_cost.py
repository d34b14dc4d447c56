#!/usr/bin/env python
"""EXPERIMENT: isolate the parameter-update tail (SGD + EMA + enqueue + BN
running-average writes) from the compute body (aug + fwd×2 + loss + bwd).

Variant A: full step (baseline).
Variant B: same body, but returns grads unused — no optimizer/EMA/enqueue.
The delta bounds what a fused/flattened update could save.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

from jax import lax
from jax.sharding import PartitionSpec as P

from vince_tpu.parallel.mesh import DATA_AXIS, MeshSpec, make_mesh
from vince_tpu.solvers import vince_step as vs

BATCH = int(os.environ.get("EXP_BATCH", 128))
STEPS = int(os.environ.get("EXP_STEPS", 10))


def main():
    cfg = vs.VinceConfig(
        sources=(vs.SourceSpec("YT", batch_size=BATCH, num_frames=4,
                               transform="StandardVideoTransform", source_id=1),),
        backbone="ResNet50", embed_size=128, image_size=224, queue_size=65536,
        temperature=0.07, momentum=0.999, compute_dtype=jnp.bfloat16,
        data_axis_size=1, queue_axis_size=1, shuffle_bn=True, bn_fold="expand",
    )
    mesh = make_mesh(MeshSpec(1, 1))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
    with jax.default_device(jax.devices("cpu")[0]):
        state = vs.init_vince_state(jax.random.PRNGKey(0), cfg, opt)
    state = vs.shard_state(state, mesh)

    canvas = int(224 / 0.875)
    host = np.random.RandomState(0).randint(0, 256, (BATCH, canvas, canvas, 3), np.uint8)
    batch = ({"data": jax.device_put(host, jax.devices()[0]),
              "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0])},)
    key = jax.random.PRNGKey(1)

    model = vs.build_encoder(cfg)

    # ---- body-only step: aug + key fwd + query fwd + loss + bwd -------------
    def body_local(state, batch, rng):
        d_idx = lax.axis_index(DATA_AXIS)
        step_rng = jax.random.fold_in(rng, state.step)
        q_all, k_all = vs._augment_sources(cfg, batch, jax.random.fold_in(step_rng, 0), d_idx)
        b_local_total = q_all.shape[0]
        from vince_tpu.parallel.collectives import (
            cross_device_shuffle, cross_device_unshuffle, make_shuffle_perm,
        )
        perm = make_shuffle_perm(jax.random.fold_in(step_rng, 1), b_local_total)
        k_in = cross_device_shuffle(k_all, perm)
        k_out, _ = model.apply(
            {"params": state.key_params, "batch_stats": state.key_batch_stats},
            k_in, train=True, mutable=["batch_stats"],
        )
        k_emb = lax.stop_gradient(k_out["embeddings"].astype(jnp.float32))
        k_emb = cross_device_unshuffle(k_emb, perm)
        queue_snapshot = lax.stop_gradient(state.queue.vectors.astype(jnp.float32))

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                q_all, train=True, mutable=["batch_stats"],
            )
            q_emb = out["embeddings"].astype(jnp.float32)
            mask, _ = vs._source_masks(cfg, cfg.sources[0], d_idx)
            from vince_tpu.ops.sharded_infonce import sharded_multi_pair_infonce
            res = sharded_multi_pair_infonce(
                q_emb, k_emb, mask, cfg.temperature, queue_shard=queue_snapshot,
            )
            return res["dist"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = sum(jnp.vdot(g, g).astype(jnp.float32)
                    for g in jax.tree_util.tree_leaves(grads))
        return {"loss/total_loss": loss, "gnorm": gnorm}

    def body(state, batch, rng):
        sspec = jax.tree_util.tree_map(lambda _: P(), state)
        sspec = sspec.replace(queue=sspec.queue.replace(vectors=P(), sources=P()))
        bspec = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)
        fn = jax.shard_map(body_local, mesh=mesh, in_specs=(sspec, bspec, P()),
                           out_specs=P(), check_vma=False)
        return fn(state, batch, rng)

    def fetch(m):
        return float(np.asarray(jax.device_get(m["loss/total_loss"])))

    # full step baseline
    full = vs.make_train_step(cfg, opt, mesh)
    st = jax.tree_util.tree_map(jnp.copy, state)
    st, m = full(st, batch, key); fetch(m)
    st, m = full(st, batch, key); fetch(m)
    t0 = time.time()
    for _ in range(3):
        fetch(m)
    rt = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(STEPS):
        st, m = full(st, batch, key)
    fetch(m)
    dt_full = (time.time() - t0 - rt) / STEPS
    print(f"full step:  {dt_full*1000:.2f} ms")

    jbody = jax.jit(body)
    m = jbody(state, batch, key); fetch(m)
    m = jbody(state, batch, key); fetch(m)
    t0 = time.time()
    for _ in range(STEPS):
        m = jbody(state, batch, key)
    fetch(m)
    dt_body = (time.time() - t0 - rt) / STEPS
    print(f"body only:  {dt_body*1000:.2f} ms  (update tail ≈ {1000*(dt_full-dt_body):.2f} ms)")


if __name__ == "__main__":
    main()
