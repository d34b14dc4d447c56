"""Worker for tests/test_multihost.py end-task val parity: run a full-epoch
classifier val pass over a 49-item val set (odd length → unequal process
shards → the zero-weight filler branch) and print the results.

Invoked as: python multihost_endtask_worker.py <pid> <nproc> <port>
Per-sample metrics depend only on their own row (eval-mode BN), so the summed
results must match between topologies regardless of how rows are sharded.
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

from vince_tpu import arg_parser  # noqa: E402
from vince_tpu.data.synthetic_dataset import SyntheticImageDataset  # noqa: E402
from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver  # noqa: E402

VAL_LEN = 49  # odd: shards 25/24 → one process needs a filler batch


class OddValSolver(EndTaskSunSceneSolver):
    def _make_dataset(self, subset):
        n = VAL_LEN if subset == "val" else 64
        return SyntheticImageDataset(self.args, subset, num_images=n)


args = arg_parser.parse_args([
    "--title", "mh_et", "--description", "t",
    "--solver", "EndTaskSunSceneSolver", "--dataset", "SyntheticImageDataset",
    "--batch-size", "24", "--input-width", "32", "--input-height", "32",
    "--vince-embedding-size", "16", "--end-task-classifier-num-classes", "4",
    "--iterations-per-epoch", "1", "--epochs", "1", "--base-lr", "0.05",
    "--base-logdir", "/tmp/mh_et_logs", "--mesh-data-size", "2",
    "--num-workers", "1", "--freeze-feature-extractor",
    "--no-restore", "--no-save", "--debug", "--platform", "cpu",
])
solver = OddValSolver(args)
solver.reset_epoch()
results = solver.run_eval()
out = {
    "results": {k: round(float(v), 6) for k, v in sorted(results.items())},
    "batches": int(solver.last_val_batches),
    "samples": int(solver.last_val_samples),
}
solver.end()
print("RESULT " + json.dumps(out), flush=True)
