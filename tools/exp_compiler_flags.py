#!/usr/bin/env python
"""Sweep XLA:TPU compiler options against the headline VINCE step.

VERDICT r3 item 2: the 65.8 ms measured step vs the 47.3 ms composite roofline
floor leaves an 18.5 ms gap attributed to intra-conv HBM streaming that XLA's
default schedule doesn't hide. Three Pallas replacements measured negative
(docs/PERFORMANCE.md); the one untried lever class is the compiler's own
scheduling/VMEM/fusion knobs, now reachable via
``make_train_step(..., compiler_options=...)`` (vince_step.py).

Runs the FULL headline config (R50, b=128@224, q=65536, bf16, fused aug) once
per option set on the real chip, timing with the value-fetch method (CLAUDE.md:
block_until_ready does not reliably wait on axon). Unknown/rejected flags are
caught per-config and recorded as errors, not crashes.

Usage (on the chip):
    python tools/exp_compiler_flags.py [--steps 10] [--out docs/compiler_flags_r4.json]
    python tools/exp_compiler_flags.py --quick   # ResNet18@64 smoke (CI/CPU)

Results land in a markdown table on stdout + JSON for docs/PERFORMANCE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Candidate option sets. Names are public XLA:TPU debug options (exercised by
# public JAX users, e.g. the MaxText performance configs); anything this
# compiler build rejects is recorded as an error row. Single-chip workload ⇒
# collective-overlap flags are out of scope; the levers that can move an
# HBM-bound conv pipeline are scoped-VMEM (bigger prefetch windows), the
# latency-hiding scheduler, and fusion aggressiveness.
SWEEP = [
    ("baseline", {}),
    # scoped VMEM: how much VMEM the memory scheduler may use for prefetch
    # buffers. v5e has 128 MiB; the default budget is smaller.
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs_on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_vmem64", {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    }),
    # memory-space-assignment retries / while-loop double buffering
    ("msa_2x", {"xla_tpu_memory_space_assignment_max_retries": "4"}),
    ("licm_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    # fusion aggressiveness
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("dot_dot_fusion_off", {"xla_tpu_dot_dot_fusion": "false"}),
    ("flash_attn_style_sched", {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "98304",
        "xla_tpu_memory_space_assignment_max_retries": "4",
    }),
]


def build(cfg_kind, compiler_options):
    import jax
    import jax.numpy as jnp
    import optax

    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
    )

    if cfg_kind == "quick":
        batch, image, backbone, queue = 16, 64, "ResNet18", 1024
    else:
        batch, image, backbone, queue = 128, 224, "ResNet50", 65536

    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=batch, num_frames=4,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=backbone, embed_size=128, image_size=image, queue_size=queue,
        temperature=0.07, momentum=0.999, compute_dtype=jnp.bfloat16,
        data_axis_size=1, queue_axis_size=1, shuffle_bn=True,
        stem_kind="s2d", bn_fold="expand",
    )
    mesh = make_mesh(MeshSpec(data_axis_size=1, queue_axis_size=1))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.sgd(0.03, momentum=0.9))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, optimizer)
    state = shard_state(state, mesh)
    step_fn = make_train_step(cfg, optimizer, mesh,
                              compiler_options=compiler_options or None)

    canvas = int(image / 0.875)
    host = np.random.RandomState(0).randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
    batch_dev = ({
        "data": jax.device_put(host, jax.devices()[0]),
        "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0]),
    },)
    return step_fn, state, batch_dev, batch


def time_config(name, options, cfg_kind, steps):
    import jax

    t_build = time.time()
    try:
        step_fn, state, batch_dev, batch = build(cfg_kind, options)
        key = jax.random.PRNGKey(1)

        def fetch(metrics):
            return float(np.asarray(jax.device_get(metrics["loss/total_loss"])))

        state, metrics = step_fn(state, batch_dev, key)
        loss = fetch(metrics)
        compile_s = time.time() - t_build
        state, metrics = step_fn(state, batch_dev, key)
        fetch(metrics)
        t0 = time.time()
        for _ in range(3):
            fetch(metrics)
        rt = (time.time() - t0) / 3
        t0 = time.time()
        for _ in range(steps):
            state, metrics = step_fn(state, batch_dev, key)
        loss = fetch(metrics)
        dt = max(time.time() - t0 - rt, 1e-9)
        assert np.isfinite(loss), "non-finite loss"
        step_ms = dt / steps * 1000
        return {"name": name, "options": options, "step_ms": round(step_ms, 2),
                "fps": round(batch * steps / dt, 1), "compile_s": round(compile_s, 1),
                "loss": round(loss, 4)}
    except Exception as e:  # rejected flag / compile failure: record, move on
        msg = repr(e)
        return {"name": name, "options": options, "error": msg[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="ResNet18@64 smoke config (works on CPU too)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of sweep names")
    ap.add_argument("--out", type=str, default="docs/compiler_flags_r4.json")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg_kind = "quick" if args.quick else "headline"
    sweep = SWEEP
    if args.only:
        names = set(args.only.split(","))
        sweep = [s for s in SWEEP if s[0] in names]

    rows = []
    base_ms = None
    for name, options in sweep:
        r = time_config(name, options, cfg_kind, args.steps)
        if "step_ms" in r and name == "baseline":
            base_ms = r["step_ms"]
        if base_ms and "step_ms" in r:
            r["vs_baseline"] = round(r["step_ms"] / base_ms, 4)
        rows.append(r)
        if "error" in r:
            print(f"{name:24s}  ERROR {r['error'][:80]}", flush=True)
        else:
            print(f"{name:24s}  {r['step_ms']:8.2f} ms  {r['fps']:8.1f} f/s  "
                  f"compile {r['compile_s']:5.1f}s"
                  + (f"  ({r['vs_baseline']:.3f}x base)" if "vs_baseline" in r else ""),
                  flush=True)

    print("\n| config | step ms | f/s | vs baseline |")
    print("|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['name']} | rejected | — | — |")
        else:
            print(f"| {r['name']} | {r['step_ms']} | {r['fps']} | "
                  f"{r.get('vs_baseline', 1.0)} |")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": cfg_kind, "steps": args.steps, "rows": rows}, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
