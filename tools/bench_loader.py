#!/usr/bin/env python
"""Input-pipeline saturation bench (VERDICT r2 weak #6 / next #8).

The sandbox pins ONE host core, so the claimed multi-core decode rate
(~30 f/s/core, docs/PERFORMANCE.md) cannot be measured here. What CAN be
proven on this host is the half of the pipeline that matters for the TPU:
with pre-decoded host arrays (what a multi-core decode pool produces), the
batch-staging path (PersistentDataLoader-shaped pool → BatchPrefetcher
device_put thread → depth-2 staged queue, reference ``vince_solver.py:
340-374``) keeps the chip at its compute-bound cadence — per-step time with
a NEW staged batch every step equals the same-batch compute cadence, i.e.
data stall ≈ 0 at the production 64 ms/step rate.

Phases:
  A. compute-only: the same device-resident batch re-fed for N steps.
  B. staged: a rotating pool of distinct pre-decoded uint8 host batches is
     staged through BatchPrefetcher (device_put on the prefetch thread) and
     every step consumes a fresh one.

Prints ONE JSON line: {"step_ms_compute", "step_ms_staged", "stall_ms",
"h2d_mb_per_batch", "stage_ms_per_batch"}.

Env: LB_BATCH (128), LB_STEPS (20), LB_BACKBONE (ResNet50), LB_IMAGE (224),
LB_QUEUE (65536), LB_POOL (4 distinct host batches).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(os.environ.get("LB_BATCH", 128))
    steps = int(os.environ.get("LB_STEPS", 20))
    backbone = os.environ.get("LB_BACKBONE", "ResNet50")
    image = int(os.environ.get("LB_IMAGE", 224))
    queue_size = int(os.environ.get("LB_QUEUE", 65536))
    pool_n = int(os.environ.get("LB_POOL", 4))

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vince_tpu.data.prefetch import BatchPrefetcher
    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=batch, num_frames=4,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=backbone, embed_size=128, image_size=image,
        queue_size=queue_size,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        data_axis_size=1, queue_axis_size=1, shuffle_bn=True,
        stem_kind="s2d", bn_fold="expand",
    )
    mesh = make_mesh(MeshSpec(1, 1))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
    state = shard_state(state, mesh)
    step = make_train_step(cfg, opt, mesh)

    canvas = int(image / 0.875)
    rng = np.random.RandomState(0)
    # the "pre-decoded array" pool a multi-core decode pipeline would hand us
    pool = [rng.randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
            for _ in range(pool_n)]
    dev = jax.devices()[0]
    mb = 2 * pool[0].nbytes / 1e6  # data + queue_data per staged batch

    def stage(i):
        h = pool[i % pool_n]
        return ({"data": jax.device_put(h, dev),
                 "queue_data": jax.device_put(h[::-1].copy(), dev)},)

    def fetch(metrics):
        # axon: block_until_ready is unreliable; fetching a value is truthful
        return float(np.asarray(jax.device_get(metrics["loss/total_loss"])))

    # compile + steady-state warmup
    key = jax.random.PRNGKey(1)
    fixed = stage(0)
    state, metrics = step(state, fixed, key)
    fetch(metrics)
    state, metrics = step(state, fixed, key)
    fetch(metrics)
    t0 = time.time()
    for _ in range(3):
        fetch(metrics)
    rt = (time.time() - t0) / 3  # tunnel round trip to subtract

    # host staging rate alone (device_put thread throughput)
    t0 = time.time()
    for i in range(pool_n):
        staged = stage(i)
    jax.block_until_ready(staged)
    stage_ms = (time.time() - t0) / pool_n * 1000

    # ---- phase A: compute-only cadence -------------------------------------
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, fixed, key)
    loss = fetch(metrics)
    dt_a = (time.time() - t0 - rt) / steps * 1000
    assert np.isfinite(loss)

    # ---- phase B: fresh staged batch every step ----------------------------
    idx = {"i": 0}

    def stage_fn(should_stop):
        if idx["i"] >= steps + 4 or (should_stop is not None and should_stop()):
            return None
        out = stage(idx["i"])
        idx["i"] += 1
        return out

    pf = BatchPrefetcher(stage_fn, depth=2).start()
    b0 = pf.get()  # let the pipeline prime one batch
    t0 = time.time()
    b = b0
    for _ in range(steps):
        state, metrics = step(state, b, key)
        b = pf.get()
    loss = fetch(metrics)
    dt_b = (time.time() - t0 - rt) / steps * 1000
    pf.stop()
    assert np.isfinite(loss)

    print(json.dumps({
        "backbone": backbone, "batch": batch, "image": image, "queue": queue_size,
        "step_ms_compute": round(dt_a, 2),
        "step_ms_staged": round(dt_b, 2),
        "stall_ms": round(dt_b - dt_a, 2),
        "h2d_mb_per_batch": round(mb, 1),
        "stage_ms_per_batch": round(stage_ms, 2),
    }))


if __name__ == "__main__":
    main()
