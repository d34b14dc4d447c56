#!/usr/bin/env python
"""200-step multi-device soak at a nontrivial shape with cross-mesh-shape
train-metric parity (VERDICT r2 #1b).

Runs the FULL production train step — fused aug, shuffled-BN key forward,
sync-BN batchnorm, queue-sharded streaming InfoNCE, SGD+EMA+enqueue — for
N steps on several (data × queue) mesh geometries of the 8-device virtual
CPU platform, feeding every mesh the identical data stream, and asserts the
loss trajectories agree. With the global-row-keyed augmentation RNG and
sync-BN this is an exact-parity claim (float reduction noise only), not a
statistical one.

Usage: python tools/soak_multichip.py [--steps 200] [--image 96]
       [--queue 8192] [--batch 32] [--meshes 8x1,2x4] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
import optax


def run_mesh(md, mq, steps, image, queue_size, batch, backbone, log_every=20):
    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
    )

    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=batch, num_frames=2,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=backbone, embed_size=64, image_size=image,
        queue_size=queue_size,
        data_axis_size=md, queue_axis_size=mq,
        shuffle_bn=True, sync_bn=True,  # sync-BN: batch stats are global →
        # the whole step is mesh-shape-invariant (global-row-keyed aug RNG)
        bn_fold="expand", stem_kind="s2d",
    )
    mesh = make_mesh(MeshSpec(md, mq))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.sgd(0.03, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, optimizer), mesh)
    step = make_train_step(cfg, optimizer, mesh)

    canvas = int(image / 0.875)
    data_rng = np.random.RandomState(0)
    losses, accs = [], []
    t_compile = t_run = 0.0
    for i in range(steps):
        # identical data stream for every mesh: host RNG draws depend only on i
        d = data_rng.randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
        k = data_rng.randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
        t0 = time.time()
        state, metrics = step(
            state, ({"data": jnp.asarray(d), "queue_data": jnp.asarray(k)},),
            jax.random.PRNGKey(1),
        )
        loss = float(np.asarray(jax.device_get(metrics["loss/total_loss"])))
        dt = time.time() - t0
        if i == 0:
            t_compile = dt
        else:
            t_run += dt
        losses.append(loss)
        accs.append(float(np.asarray(jax.device_get(metrics["nce_accuracy"]))))
        if i % log_every == 0 or i == steps - 1:
            print(f"  [{md}x{mq}] step {i:4d} loss={loss:.5f} "
                  f"acc={accs[-1]:.4f} ({dt:.2f}s)", flush=True)
        assert np.isfinite(loss), f"non-finite loss at step {i}"
    tail = int(np.asarray(jax.device_get(state.queue.tail)))
    total = int(np.asarray(jax.device_get(state.queue.total)))
    return {
        "mesh": f"{md}x{mq}", "losses": losses, "accs": accs,
        "queue_tail": tail, "queue_total": total,
        "compile_s": round(t_compile, 1),
        "s_per_step": round(t_run / max(steps - 1, 1), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--image", type=int, default=96)
    ap.add_argument("--queue", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--backbone", default="ResNet18")
    ap.add_argument("--meshes", default="8x1,2x4")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    results = []
    for mesh_str in args.meshes.split(","):
        md, mq = (int(x) for x in mesh_str.split("x"))
        print(f"=== soak mesh {md}x{mq}: {args.backbone} b={args.batch} "
              f"@{args.image}² q={args.queue} × {args.steps} steps ===", flush=True)
        results.append(run_mesh(md, mq, args.steps, args.image, args.queue,
                                args.batch, args.backbone))

    ref = results[0]
    ok = True
    for r in results[1:]:
        dl = np.abs(np.array(r["losses"]) - np.array(ref["losses"]))
        rel = dl / np.maximum(np.abs(ref["losses"]), 1e-6)
        print(f"parity {r['mesh']} vs {ref['mesh']}: max|Δloss|={dl.max():.2e} "
              f"max rel={rel.max():.2e} (final {ref['losses'][-1]:.5f} vs "
              f"{r['losses'][-1]:.5f})")
        same_queue = (r["queue_tail"] == ref["queue_tail"]
                      and r["queue_total"] == ref["queue_total"])
        print(f"  queue tail/total match: {same_queue}")
        # exact-parity claim: per-step relative tolerance; float reduction
        # noise compounds through SGD so allow growth with step index
        tol = 1e-3 + 5e-3 * np.arange(len(dl)) / len(dl)
        if not (rel <= tol).all():
            bad = int(np.argmax(rel > tol))
            print(f"  !! divergence beyond tolerance at step {bad}: "
                  f"rel={rel[bad]:.2e} > {tol[bad]:.2e}")
            ok = False
    summary = {
        "config": vars(args),
        "results": [{k: (v if k != 'losses' and k != 'accs' else v[::10])
                     for k, v in r.items()} for r in results],
        "parity_ok": ok,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.json}")
    print(f"PARITY {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
