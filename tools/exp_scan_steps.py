#!/usr/bin/env python
"""EXPERIMENT: amortize per-step dispatch by scanning N train steps in one
XLA program.

The trace shows 61.2 ms device-busy vs ~65 ms wall per step — ~4 ms of
per-dispatch gap (remote-tunnel dispatch + host sync). `lax.scan` over
pre-staged batches runs N steps per dispatch; if the gap is dispatch-bound,
fps rises by ~gap/step.
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers import vince_step as vs

BATCH = int(os.environ.get("EXP_BATCH", 128))
SCAN = int(os.environ.get("EXP_SCAN", 4))
OUTER = int(os.environ.get("EXP_OUTER", 4))


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
    rng = np.random.RandomState(0)
    host = rng.randint(0, 256, (SCAN, BATCH, canvas, canvas, 3), np.uint8)
    batches = ({"data": jax.device_put(host, jax.devices()[0]),
                "queue_data": jax.device_put(host[:, ::-1].copy(), jax.devices()[0])},)
    key = jax.random.PRNGKey(1)

    step_fn = vs.make_train_step_fn(cfg, opt, mesh)

    @jax.jit
    def scan_steps(state, batches, rng):
        def body(s, b):
            s2, m = step_fn(s, (b,), rng)
            return s2, m["loss/total_loss"]

        state, losses = lax.scan(body, state, batches[0])
        return state, losses

    def fetch(x):
        return np.asarray(jax.device_get(x))

    state, losses = scan_steps(state, batches, key)
    fetch(losses)
    state, losses = scan_steps(state, batches, key)
    fetch(losses)
    t0 = time.time()
    for _ in range(3):
        fetch(losses)
    rt = (time.time() - t0) / 3

    t0 = time.time()
    for _ in range(OUTER):
        state, losses = scan_steps(state, batches, key)
    l = fetch(losses)
    dt = (time.time() - t0 - rt) / (OUTER * SCAN)
    print(f"scan({SCAN}) step: {dt*1000:.2f} ms/step  "
          f"({BATCH/dt:.0f} frames/s)  loss={l[-1]:.3f}")


if __name__ == "__main__":
    main()
