#!/usr/bin/env python
"""Capture a jax.profiler trace of the bench-shaped VINCE train step on the
attached TPU and print the per-op time breakdown (grouped by op-name stem).

This is how docs/PERFORMANCE.md's tables were produced. Notes for the axon
tunnel: time by fetching values (block_until_ready does not reliably wait),
and never profile while a heavy host job runs. Env overrides: PROF_BATCH,
PROF_BACKBONE, PROF_STEPS, PROF_IMAGE, PROF_BN_FOLD (none|expand|all), PROF_DIR."""
import glob, gzip, json, os, sys, collections
import numpy as np
import jax, jax.numpy as jnp, optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers.vince_step import (
    SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
)

BATCH = int(os.environ.get("PROF_BATCH", 128))
IMAGE = int(os.environ.get("PROF_IMAGE", 224))
STEPS = int(os.environ.get("PROF_STEPS", 3))
BACKBONE = os.environ.get("PROF_BACKBONE", "ResNet50")
cfg = VinceConfig(
    sources=(SourceSpec("YT", batch_size=BATCH, num_frames=4,
                        transform="StandardVideoTransform", source_id=1),),
    backbone=BACKBONE, embed_size=128, image_size=IMAGE, queue_size=65536,
    compute_dtype=jnp.bfloat16, data_axis_size=1, queue_axis_size=1,
    shuffle_bn=True,
    bn_fold=os.environ.get("PROF_BN_FOLD", "expand"),  # match production default
    fold_kernel=bool(int(os.environ.get("PROF_FOLD_KERNEL", "0"))),
    dw_kind=os.environ.get("PROF_DW_KIND", "conv"),
)
mesh = make_mesh(MeshSpec(1, 1))
opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
with jax.default_device(jax.devices("cpu")[0]):
    state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
state = shard_state(state, mesh)
step = make_train_step(cfg, opt, mesh)
canvas = int(IMAGE / 0.875)
host = np.random.RandomState(0).randint(0, 256, (BATCH, canvas, canvas, 3), np.uint8)
batch = ({"data": jax.device_put(host, jax.devices()[0]),
          "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0])},)
key = jax.random.PRNGKey(1)

state, m = step(state, batch, key)
_ = float(np.asarray(jax.device_get(m["loss/total_loss"])))
state, m = step(state, batch, key)
_ = float(np.asarray(jax.device_get(m["loss/total_loss"])))

trace_dir = os.environ.get("PROF_DIR", "/tmp/proftrace")
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(STEPS):
    state, m = step(state, batch, key)
_ = float(np.asarray(jax.device_get(m["loss/total_loss"])))
jax.profiler.stop_trace()

files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = collections.Counter()
cnt = collections.Counter()
for f in files:
    tr = json.load(gzip.open(f, "rt"))
    # find TPU device pids (not host threads)
    names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {p for p, n in names.items() if "TPU" in n or "/device" in n.lower()}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in tpu_pids and "dur" in ev:
            nm = ev["name"].split(".")[0]
            agg[nm] += ev["dur"]
            cnt[nm] += 1
total = sum(agg.values())
print(f"total device time: {total/1e3/STEPS:.2f} ms/step over {STEPS} steps")
for nm, us in agg.most_common(18):
    print(f"{us/1e3/STEPS:8.2f} ms/step  x{cnt[nm]//STEPS:4d}  {nm}")
