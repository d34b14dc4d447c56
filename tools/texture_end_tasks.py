#!/usr/bin/env python
"""End-task probes on the NON-color-separable texture family (VERDICT r4
item 7): replace the color-separable probe evidence with runs a color
histogram provably cannot solve (tests/test_synthetic_texture.py pins the
property on the data itself).

Four phases through the PRODUCTION solvers (same code the CLI drives):

  1. VINCE pretrain on SyntheticTextureVideoDataset (identity NCE) → Orbax
     checkpoint.
  2. Linear classifier probe (frozen features) on
     SyntheticTextureImageDataset — class identities UNSEEN in pretrain
     (different seed universe), so above-chance accuracy requires transferable
     texture features.
  3. Kinetics-style LSTM probe (frozen features) on
     SyntheticTextureClipDataset.
  4. SiamFC training on texture pairs (--synthetic-texture GOT10k fallback) +
     OTB-protocol eval on TextureSequences.

Writes one JSON artifact with per-phase curves. CPU-mesh smoke:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/texture_end_tasks.py --platform cpu --pretrain-steps 200 \
        --probe-iters 40 --out /tmp/tex_et.json

Full run (the committed evidence): --pretrain-steps 4000 --probe-iters 400.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse(argv):
    from vince_tpu.arg_parser import build_parser, finalize_args

    return finalize_args(build_parser().parse_args(argv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-steps", type=int, default=4000)
    ap.add_argument("--probe-iters", type=int, default=400)
    ap.add_argument("--tracking-iters", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image", type=int, default=36)
    ap.add_argument("--embed", type=int, default=32)
    ap.add_argument("--queue", type=int, default=512)
    ap.add_argument("--num-classes", type=int, default=4)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--workdir", default="/tmp/texture_end_tasks")
    ap.add_argument("--out", default="docs/texture_end_tasks_r5.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-pretrain", action="store_true",
                    help="reuse an existing checkpoint in --workdir")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_dev = len(jax.devices())
    md = 4 if n_dev >= 8 else (2 if n_dev >= 4 else 1)
    mq = 2 if n_dev >= 8 else 1
    os.makedirs(args.workdir, exist_ok=True)
    ckpt_dir = os.path.join(args.workdir, "pretrain_ckpt")
    report = {"config": vars(args).copy(), "mesh": f"{md}x{mq}",
              "platform": jax.devices()[0].platform, "phases": {}}

    common = [
        "--input-width", str(args.image), "--input-height", str(args.image),
        "--vince-embedding-size", str(args.embed),
        "--base-logdir", args.workdir,
        "--mesh-data-size", str(md),
        "--num-workers", "2",
        "--norm-kind", "groupnorm",  # BN-noise-free at small per-device batch
        "--debug",
    ]

    # ---- 1. pretrain ------------------------------------------------------
    t0 = time.time()
    if not args.skip_pretrain:
        from vince_tpu.solvers.vince_solver import VinceSolver

        iters = max(args.pretrain_steps, 1)
        pa = _parse([
            "--title", "tex_et", "--description", "pretrain",
            "--solver", "VinceSolver",
            "--dataset", "SyntheticTextureVideoDataset", "--use-videos",
            "--inter-batch-comparison", "--num-frames", "2",
            "--batch-size", str(args.batch),
            "--vince-queue-size", str(args.queue),
            "--iterations-per-epoch", str(iters), "--epochs", "1",
            # the round-4 sustaining config: at b=32, lr 0.01/m 0.99 degenerates
            # to the 1/batch attractor regardless of objective (jigsaw control
            # matrix, docs/plain_lr003_m999_r4.json) — lr 0.003/m 0.999 learns
            "--base-lr", "0.003", "--vince-momentum", "0.999", "--no-warmup",
            "--mesh-queue-size", str(mq),
            "--synthetic-num-videos", "4096",
            "--save-frequency", str(iters),
            "--checkpoint-dir", ckpt_dir,
            "--no-restore",
            *common,
        ])
        s = VinceSolver(pa)
        s.reset_epoch()
        curve = {"step": [], "nce_accuracy": [], "nce_loss": []}
        m = None
        for i in range(iters):
            m = s.run_train_iteration()
            if i % args.log_every == 0 or i == iters - 1:
                acc = float(np.asarray(m["nce_accuracy"]))
                loss = float(np.asarray(m["loss/nce_loss"]))
                curve["step"].append(i)
                curve["nce_accuracy"].append(round(acc, 4))
                curve["nce_loss"].append(round(loss, 4))
                print(f"[pretrain] step {i} acc={acc:.4f} loss={loss:.4f}",
                      flush=True)
        s.save()
        s.end()
        report["phases"]["pretrain"] = {
            "curve": curve, "chance": round(1.0 / args.batch, 4),
            "wall_s": round(time.time() - t0, 1),
        }

    # ---- 2/3. frozen probes ----------------------------------------------
    def probe(tag, solver_name, dataset, extra):
        from vince_tpu.solver_runner import get_solver_class

        t0 = time.time()
        pa = _parse([
            "--title", "tex_et", "--description", tag,
            "--solver", solver_name, "--dataset", dataset,
            "--batch-size", str(args.batch),
            "--end-task-classifier-num-classes", str(args.num_classes),
            "--iterations-per-epoch", str(args.probe_iters), "--epochs", "1",
            "--base-lr", "0.05", "--no-warmup",
            "--freeze-feature-extractor",
            "--checkpoint-dir", ckpt_dir,
            "--no-save",
            *extra, *common,
        ])
        s = get_solver_class(solver_name)(pa)
        s.reset_epoch()
        curve = {"step": [], "accuracy": []}
        accs = []
        for i in range(args.probe_iters):
            m = s.run_train_iteration()
            acc = float(np.asarray(m["classifier_accuracy_0"]))
            accs.append(acc)
            if i % args.log_every == 0 or i == args.probe_iters - 1:
                curve["step"].append(i)
                curve["accuracy"].append(round(acc, 4))
                print(f"[{tag}] iter {i} acc={acc:.4f}", flush=True)
        val = s.run_val()
        s.end()
        n = max(len(accs) // 10, 1)
        return {
            "curve": curve,
            "train_acc_first10pct": round(float(np.mean(accs[:n])), 4),
            "train_acc_last10pct": round(float(np.mean(accs[-n:])), 4),
            "val": {k: round(float(v), 4) for k, v in val.items()},
            "chance": round(1.0 / args.num_classes, 4),
            "wall_s": round(time.time() - t0, 1),
        }

    report["phases"]["classifier_probe"] = probe(
        "cls_probe", "EndTaskSunSceneSolver", "SyntheticTextureImageDataset", [])
    report["phases"]["kinetics_probe"] = probe(
        "kin_probe", "EndTaskKinetics400Solver", "SyntheticTextureClipDataset",
        ["--num-frames", "2"])

    # ---- 4. tracking ------------------------------------------------------
    from vince_tpu.solver_runner import get_solver_class

    t0 = time.time()
    ta = _parse([
        "--title", "tex_et", "--description", "tracking",
        "--solver", "EndTaskTrackingSolver", "--dataset", "GOT10kDataset",
        "--backbone", "ResNet18SiamFCDilated",
        "--batch-size", str(max(4, md)),
        "--input-width", "120", "--input-height", "120",
        "--vince-embedding-size", str(args.embed),
        "--iterations-per-epoch", str(args.tracking_iters), "--epochs", "1",
        "--base-lr", "0.01", "--no-warmup",
        "--synthetic-texture",
        "--no-restore", "--no-save",
        "--base-logdir", args.workdir,
        "--mesh-data-size", str(md), "--num-workers", "2", "--debug",
    ])
    s = get_solver_class("EndTaskTrackingSolver")(ta)
    s.reset_epoch()
    tcurve = {"step": [], "loss": []}
    for i in range(args.tracking_iters):
        m = s.run_train_iteration()
        if i % args.log_every == 0 or i == args.tracking_iters - 1:
            loss = float(np.asarray(m["loss/siam_tracking_loss"]))
            tcurve["step"].append(i)
            tcurve["loss"].append(round(loss, 4))
            print(f"[tracking] iter {i} loss={loss:.4f}", flush=True)
    cwd = os.getcwd()
    os.chdir(args.workdir)  # keep results/ out of the repo
    try:
        otb = s.run_eval()
    finally:
        os.chdir(cwd)
    s.end()
    report["phases"]["tracking"] = {
        "curve": tcurve,
        "otb_texture": {k: round(float(v), 4) for k, v in otb.items()},
        "wall_s": round(time.time() - t0, 1),
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
