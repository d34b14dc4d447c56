#!/usr/bin/env python
"""Measure the CLI train-loop phase split (data/step/metrics/log) at a
production-like shape on the real chip — is there host work worth
overlapping with device compute?

The jitted step is benched in isolation by bench.py; this drives the actual
``VinceSolver.run_train_iteration`` path (loader → device_put → step →
metrics fetch → thumbnails/logging) and prints the time_meters split.

Env: OVERLAP_BATCH (128), OVERLAP_IMAGE (224), OVERLAP_ITERS (30),
OVERLAP_BACKBONE (ResNet50), OVERLAP_QUEUE (65536).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("OVERLAP_BATCH", 128))
IMAGE = int(os.environ.get("OVERLAP_IMAGE", 224))
ITERS = int(os.environ.get("OVERLAP_ITERS", 30))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    from vince_tpu.arg_parser import parse_args

    argv = [
        "--title", "exp_overlap", "--description", "overlap",
        "--solver", "VinceSolver", "--dataset", "SyntheticVideoDataset",
        "--use-videos", "--inter-batch-comparison",
        "--num-frames", "4",
        "--batch-size", str(BATCH),
        "--input-width", str(IMAGE), "--input-height", str(IMAGE),
        "--vince-queue-size", os.environ.get("OVERLAP_QUEUE", "65536"),
        "--vince-embedding-size", "128",
        "--backbone", os.environ.get("OVERLAP_BACKBONE", "ResNet50"),
        "--iterations-per-epoch", str(ITERS), "--epochs", "1",
        "--base-lr", "0.03", "--base-logdir", "/tmp/exp_overlap_logs",
        "--mesh-data-size", "1", "--mesh-queue-size", "1",
        "--num-workers", "2", "--synthetic-num-videos", "64",
        "--save-frequency", "100000", "--no-save",
        "--image-log-frequency", "100000",
        "--compute-dtype", "bfloat16",
    ]
    argv += os.environ.get("OVERLAP_EXTRA", "").split()
    args = parse_args(argv)
    from vince_tpu.solver_runner import get_solver_class

    import time

    t0 = time.perf_counter()
    solver = get_solver_class(args.solver or "VinceSolver")(args, None, None)
    print(f"[overlap] solver setup (incl. queue prefill): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    solver.reset_epoch()
    # warm up (compile) then measure
    for i in range(3):
        t0 = time.perf_counter()
        solver.run_train_iteration()
        print(f"[overlap] warmup iter {i}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    for m in solver.time_meters.values():
        m.reset()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        solver.run_train_iteration()
    wall = (time.perf_counter() - t0) / ITERS * 1e3
    prefetch = "on" if getattr(solver, "_prefetcher", None) else "off"
    print(f"\n== CLI loop split ({os.environ.get('OVERLAP_BACKBONE', 'ResNet50')} "
          f"b={BATCH} @{IMAGE}², {ITERS} iters, prefetch {prefetch}) ==")
    for k, m in solver.time_meters.items():
        print(f"{k:18s} {m.value() * 1e3:8.2f} ms")
    print(f"{'wall/iter':18s} {wall:8.2f} ms")
    solver.end()


if __name__ == "__main__":
    main()
