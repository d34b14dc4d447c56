"""Worker for tests/test_multihost.py step-parity: run 3 VINCE train steps on
a FIXED global batch over a 2(data)x2(queue) mesh and print the metrics.

Invoked as: python multihost_step_worker.py <pid> <nproc> <port>
nproc=1 runs single-process (4 local devices); nproc=2 runs as one process of
a gloo CPU cluster (2 local devices each). Every invocation fabricates the
SAME full global batch from a fixed seed and stages only its slice, so the
two topologies must produce numerically matching results.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))  # repo root (script runs from tests/helpers)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )

import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vince_tpu.parallel import multihost  # noqa: E402
from vince_tpu.parallel.mesh import MeshSpec, make_mesh  # noqa: E402
from vince_tpu.solvers.vince_step import (  # noqa: E402
    SourceSpec,
    VinceConfig,
    init_vince_state,
    make_train_step,
    shard_state,
)

B = 16
cfg = VinceConfig(
    sources=(SourceSpec("YT", batch_size=B, num_frames=2, source_id=1),),
    backbone="ResNet18",
    embed_size=16,
    image_size=32,
    queue_size=64,
    data_axis_size=2,
    queue_axis_size=2,
    self_batch=True,
)
mesh = make_mesh(MeshSpec(2, 2))
opt = optax.sgd(0.03, momentum=0.9)
state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
step = make_train_step(cfg, opt, mesh)

rng = np.random.RandomState(0)
full = {
    "data": rng.randint(0, 256, (B, 40, 40, 3), np.uint8),
    "queue_data": rng.randint(0, 256, (B, 40, 40, 3), np.uint8),
}
# mesh rows (the data axis) are contiguous over processes: process p's
# addressable data shards are global rows [p*B/nproc, (p+1)*B/nproc)
sl = slice(pid * B // nproc, (pid + 1) * B // nproc)
sharding = NamedSharding(mesh, P("data"))
batch = ({k: multihost.stage(sharding, v[sl]) for k, v in full.items()},)

metrics = {}
for _ in range(3):
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
out = {
    "metrics": {k: float(np.asarray(jax.device_get(v))) for k, v in metrics.items()},
    "tail": int(np.asarray(jax.device_get(state.queue.tail))),
    "total": int(np.asarray(jax.device_get(state.queue.total))),
    "q_absmean": float(np.abs(multihost.fetch(state.queue.vectors)).mean()),
}
print("RESULT " + json.dumps(out), flush=True)
