#!/usr/bin/env python
"""Long-horizon jigsaw (PIRL) full-path soak — VERDICT r3 item 3.

Round 2/3 bounded the jigsaw pretrain path at 300 toy steps (5 configs) and a
1500-step chip soak: loss falls, the perm reaches the embedding, but full-path
jigsaw-NCE accuracy stayed at chance — hypothesized "PIRL-horizon behavior".
This tool runs the full production step (patchify → per-patch backbone →
JigsawHeads → sharded queue NCE, reference ``vince_model.py:144-171`` +
``vince/train_vince_jigsaw.sh``) for 5–10k+ steps on the identity-grid task
from tests/test_jigsaw_learning.py and logs the accuracy trajectory, so the
hypothesis becomes either a curve leaving chance or a documented stronger
negative.

Usage:
    python tools/soak_jigsaw.py --steps 8000 --out docs/jigsaw_soak_r4.json
    python tools/soak_jigsaw.py --steps 200 --platform cpu   # smoke

Runs on whatever jax.devices() provides (1 real chip → 1×1 mesh; --platform
cpu + XLA_FLAGS=...device_count=8 → 2×2 mesh slice).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--num-ids", type=int, default=4096)
    ap.add_argument("--image", type=int, default=36)
    ap.add_argument("--queue", type=int, default=512)
    ap.add_argument("--embed", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--momentum", type=float, default=0.99)
    ap.add_argument("--tau", type=float, default=0.07,
                    help="InfoNCE temperature (higher = softer, anti-collapse)")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--out", type=str, default="docs/jigsaw_soak_r4.json")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--plain", action="store_true",
                    help="control run: same task through the PLAIN (no-jigsaw) "
                         "path — separates task difficulty from the jigsaw "
                         "objective")
    ap.add_argument("--identity-perms", action="store_true",
                    help="control run: full jigsaw path but perm = identity — "
                         "isolates permutation-invariance difficulty from the "
                         "patchify/head/cross-head-alignment pipeline")
    ap.add_argument("--both-sides", action="store_true",
                    help="control run: jigsaw BOTH query and key (same head on "
                         "both sides, like the plain path) — isolates the "
                         "cross-head (plain-embedding vs jigsaw-head) alignment "
                         "difficulty of the reference's 50/50 alternation")
    ap.add_argument("--align-weight", type=float, default=0.0,
                    help="PIRL-style cross-head alignment weight for the "
                         "alternating scheme (VinceConfig.jigsaw_align_weight) "
                         "— the round-5 remedy for the cross-head blocker")
    ap.add_argument("--warmup-both", type=int, default=0,
                    help="remedy candidate 2 (VERDICT r4 item 2): run the "
                         "first N steps with BOTH sides jigsawed (the mode "
                         "that demonstrably learns, 0.82 val NCE) so the "
                         "jigsaw head and encoder co-train into one embedding "
                         "space, then switch to the reference's 50/50 "
                         "alternation")
    args = ap.parse_args()
    assert not (args.plain and (args.identity_perms or args.both_sides))

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state,
    )

    n_dev = len(jax.devices())
    md = 2 if n_dev >= 4 else 1
    mq = 2 if n_dev >= 4 else 1

    canvas = int(round(args.image / 0.875))
    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=args.batch, num_frames=1,
                            source_id=1,
                            # flip+crop only: color identity survives the aug
                            transform="GOT10KTransform"),),
        backbone="ResNet18",
        embed_size=args.embed,
        image_size=args.image,
        queue_size=args.queue,
        temperature=args.tau,
        momentum=args.momentum,
        jigsaw=not args.plain,
        jigsaw_identity_perms=args.identity_perms,
        jigsaw_align_weight=args.align_weight,
        inter_batch=True,
        data_axis_size=md,
        queue_axis_size=mq,
        norm_kind="groupnorm",  # BN-noise-free at small per-device batches
    )
    mesh = make_mesh(MeshSpec(md, mq))
    opt = optax.chain(optax.add_decayed_weights(1e-4),
                      optax.sgd(args.lr, momentum=0.9))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
    state = shard_state(state, mesh)
    if args.plain:
        steps = {"plain": make_train_step(cfg, opt, mesh)}
    elif args.both_sides:
        steps = {"both": make_train_step(cfg, opt, mesh, jigsaw_side="both")}
    else:
        steps = {
            "query": make_train_step(cfg, opt, mesh, jigsaw_side="query"),
            "key": make_train_step(cfg, opt, mesh, jigsaw_side="key"),
        }
        if args.warmup_both:
            steps["both"] = make_train_step(cfg, opt, mesh, jigsaw_side="both")

    # identity-grid task (tests/test_jigsaw_learning.py): identity i = fixed
    # 3×3 grid of 9 distinct random cell colors; pool ≫ queue so stale bank
    # rows rarely duplicate a batch identity (exact-tie negatives)
    rs = np.random.RandomState(7)
    colors = rs.randint(0, 256, (args.num_ids, 3, 3, 3), np.uint8)
    cell = -(-canvas // 3)
    canvases = np.repeat(np.repeat(colors, cell, axis=1), cell, axis=2)
    canvases = canvases[:, :canvas, :canvas, :]

    # batch rows shard over the data axis (replicated over queue axis) —
    # device_put to a single device breaks on multi-device smoke meshes
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))
    rs2 = np.random.RandomState(0)
    curve = {"step": [], "nce_accuracy": [], "nce_loss": [],
             "cosine_sim": [], "cosine_sim_neg_max": []}
    acc_window = []
    t0 = time.time()
    for i in range(args.steps):
        ids = rs2.choice(args.num_ids, args.batch, replace=False)
        imgs = jax.device_put(canvases[ids], batch_sharding)
        batch = ({"data": imgs, "queue_data": imgs},)
        if args.plain:
            fn = steps["plain"]
        elif args.both_sides:
            fn = steps["both"]
        elif i < args.warmup_both:
            fn = steps["both"]
        else:
            # reference vince_solver.py:397-403: 50/50 which side is jigsawed
            fn = steps["query"] if i % 2 else steps["key"]
        state, metrics = fn(state, batch, jax.random.PRNGKey(i))
        if i % args.log_every == 0 or i == args.steps - 1:
            acc = float(np.asarray(jax.device_get(metrics["nce_accuracy"])))
            loss = float(np.asarray(jax.device_get(metrics["loss/nce_loss"])))
            curve["step"].append(i)
            curve["nce_accuracy"].append(round(acc, 4))
            curve["nce_loss"].append(round(loss, 4))
            # collapse diagnostics: cosine_sim→1 with neg_max→1 means the
            # encoder maps everything to one point (loss pins at ln(Q+B))
            for mk in ("cosine_sim", "cosine_sim_neg_max"):
                if mk in metrics:
                    curve[mk].append(
                        round(float(np.asarray(jax.device_get(metrics[mk]))), 4))
            acc_window.append(acc)
            rate = (i + 1) / (time.time() - t0)
            print(f"step {i:6d}  acc={acc:.4f}  loss={loss:.4f}  "
                  f"({rate:.1f} steps/s)", flush=True)
            if not np.isfinite(loss):
                print("non-finite loss; aborting soak", file=sys.stderr)
                break

    n = max(len(acc_window) // 10, 1)
    mode = ("plain" if args.plain else
            "jigsaw_both_sides" if args.both_sides else "jigsaw")
    if args.identity_perms:
        mode += "+identity_perms"
    if args.align_weight > 0:
        mode += f"+align{args.align_weight:g}"
    if args.warmup_both:
        mode += f"+warmup_both{args.warmup_both}"
    summary = {
        "mode": mode,
        "config": {k: getattr(args, k) for k in
                   ("steps", "batch", "num_ids", "image", "queue", "embed",
                    "lr", "momentum", "tau", "align_weight", "warmup_both")},
        "mesh": f"{md}x{mq}",
        "platform": jax.devices()[0].platform,
        # argmax-over-candidates accuracy; with untrained/tied embeddings it
        # pins near 1/batch (measured in tests/test_jigsaw_learning.py)
        "chance": round(1.0 / args.batch, 4),
        "acc_first10pct": round(float(np.mean(acc_window[:n])), 4),
        "acc_last10pct": round(float(np.mean(acc_window[-n:])), 4),
        "curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nacc {summary['acc_first10pct']} → {summary['acc_last10pct']}  "
          f"({summary['wall_s']:.0f}s)  wrote {args.out}")


if __name__ == "__main__":
    main()
