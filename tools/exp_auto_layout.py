#!/usr/bin/env python
"""EXPERIMENT: AUTO (XLA-chosen) input/output layouts for the train step.

The step-trace shows ~4 GB/step of layout copies ("data formatting" 1.3 GB +
copy-done 2.8 GB), including per-step copies of conv kernels out of their
default checkpoint layout into the conv-preferred layout. With
Format(Layout.AUTO) on the jitted step (and the state device_put into the
compiler-chosen formats once), those conversions should happen once at init
instead of every step.

Prints default vs AUTO step time at the headline config.
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

from jax.experimental.layout import Format, Layout

from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers.vince_step import (
    SourceSpec, VinceConfig, init_vince_state, make_train_step_fn, shard_state,
)

BATCH = int(os.environ.get("EXP_BATCH", 128))
STEPS = int(os.environ.get("EXP_STEPS", 10))


def build():
    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=BATCH, num_frames=4,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=os.environ.get("EXP_BACKBONE", "ResNet50"),
        embed_size=128, image_size=224, queue_size=65536,
        temperature=0.07, momentum=0.999, compute_dtype=jnp.bfloat16,
        data_axis_size=1, queue_axis_size=1, shuffle_bn=True,
        bn_fold="expand",
    )
    mesh = make_mesh(MeshSpec(1, 1))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
    state = shard_state(state, mesh)
    fn = make_train_step_fn(cfg, opt, mesh)
    canvas = int(224 / 0.875)
    host = np.random.RandomState(0).randint(0, 256, (BATCH, canvas, canvas, 3), np.uint8)
    batch = ({"data": jax.device_put(host, jax.devices()[0]),
              "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0])},)
    key = jax.random.PRNGKey(1)
    return cfg, fn, state, batch, key


def fetch(metrics):
    return float(np.asarray(jax.device_get(metrics["loss/total_loss"])))


def run(step_fn, state, batch, key, label):
    state, metrics = step_fn(state, batch, key)
    fetch(metrics)
    state, metrics = step_fn(state, batch, key)
    fetch(metrics)
    t0 = time.time()
    for _ in range(3):
        fetch(metrics)
    rt = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = step_fn(state, batch, key)
    loss = fetch(metrics)
    dt = max(time.time() - t0 - rt, 1e-9)
    print(f"{label}: {dt/STEPS*1000:.2f} ms/step  loss={loss:.3f}")
    return state


def main():
    cfg, fn, state, batch, key = build()

    # ---- default layouts -----------------------------------------------------
    step_def = jax.jit(fn, donate_argnums=(0,))
    # real copy (device_put of a live on-device array is a no-op) so donation
    # in this run doesn't delete the buffers the AUTO run needs
    state_def = jax.tree_util.tree_map(jnp.copy, state)
    run(step_def, state_def, batch, key, "default layouts")

    # ---- AUTO layouts --------------------------------------------------------
    auto = Format(Layout.AUTO)
    step_auto = jax.jit(
        fn,
        in_shardings=(auto, auto, auto),
        out_shardings=(auto, auto),
        donate_argnums=(0,),
    )
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (state, batch, key)
    )
    lowered = step_auto.lower(*abstract)
    compiled = lowered.compile()
    in_fmts = compiled.input_formats[0]
    state_fmt, batch_fmt, key_fmt = in_fmts
    state_auto = jax.device_put(state, state_fmt)
    batch_auto = jax.device_put(batch, batch_fmt)
    key_auto = jax.device_put(key, key_fmt)
    run(compiled, state_auto, batch_auto, key_auto, "AUTO layouts   ")


if __name__ == "__main__":
    main()
