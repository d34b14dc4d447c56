#!/usr/bin/env python
"""Frame-retrieval probe for contrastive checkpoints on procedural datasets.

The CIFAR-kNN analog for the synthetic families (reference
``vince_solver.py:651-693`` plays this role on CIFAR): embed F independently
jittered frames of each of N **val-split** videos (identities the training
run never saw — train/val use disjoint seed ranges) through the restored
solver's own ``embed_fn`` (exact training-path finalize/normalization), then
score leave-one-out nearest-neighbor retrieval: does each frame's nearest
other frame (cosine) come from the same video?

Chance = (F-1)/(N·F-1). Run once with ``--no-restore`` for the random-init
baseline — the gap isolates what training learned. On
SyntheticTextureVideoDataset, identities carry zero color-statistic signal
(tests/test_synthetic_texture.py), so above-baseline retrieval on UNSEEN
identities means the encoder learned spatial structure that generalizes.

Usage (config flags must match the training run — echoed in its log):
    python tools/eval_retrieval.py --title soak_texture_q262144 \
        --description texq --base-logdir /tmp/chip_r4/logs \
        --solver VinceSolver --dataset SyntheticTextureVideoDataset \
        --backbone ResNet18 --vince-embedding-size 128 --vince-queue-size 262144 \
        --input-width 64 --input-height 64 --num-frames 4 --use-videos \
        --inter-batch-comparison --batch-size 48 --bn-fold expand \
        --mesh-data-size 1 --mesh-queue-size 1 \
        --retrieval-videos 64 --retrieval-frames 6
"""

import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from vince_tpu.arg_parser import build_parser, finalize_args

    parser = build_parser()
    parser.add_argument("--retrieval-videos", type=int, default=64)
    parser.add_argument("--retrieval-frames", type=int, default=6)
    parser.add_argument("--retrieval-subset", default="val")
    args = finalize_args(parser.parse_args(argv))
    args.disable_dataloader = True  # no train loaders / queue prefill
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from vince_tpu.data import get_dataset
    from vince_tpu.solvers.vince_solver import VinceSolver

    solver = VinceSolver(args)
    size = args.input_width
    bs = args.batch_size

    n, f = args.retrieval_videos, args.retrieval_frames
    ds_args = types.SimpleNamespace(
        num_frames=f, input_width=size, input_height=size, repeatable=True,
    )
    ds = get_dataset(args.dataset or "SyntheticTextureVideoDataset")(
        ds_args, args.retrieval_subset, num_videos=n, num_images_to_return=f)

    def center_crop(img):
        y = (img.shape[0] - size) // 2
        x = (img.shape[1] - size) // 2
        return img[y:y + size, x:x + size]

    # embed all N*F frames through the fixed-shape jitted embed_fn
    frames = np.stack([
        np.stack([center_crop(fr) for fr in ds[i]["data"]]) for i in range(n)
    ]).reshape(n * f, size, size, 3)
    feats = []
    for i in range(0, n * f, bs):
        chunk = frames[i:i + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        emb, _ = solver.embed_fn(solver.state, jnp.asarray(chunk))
        feats.append(np.asarray(jax.device_get(emb), np.float32)[: bs - pad or bs])
    flat = np.concatenate(feats)[: n * f]
    flat = flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)

    sims = flat @ flat.T
    np.fill_diagonal(sims, -np.inf)
    nn = np.argmax(sims, axis=1)
    hits = (nn // f) == (np.arange(n * f) // f)
    acc = float(hits.mean())
    chance = (f - 1) / (n * f - 1)
    # raw optimizer step, not solver.iteration (= samples scaled by THIS
    # run's batch size, misleading when eval batch != training batch)
    step = int(np.asarray(jax.device_get(solver.state.step)))
    print(f"{args.dataset} {args.retrieval_subset}: retrieval@1 = {acc:.4f} "
          f"(chance {chance:.4f}, {n} unseen videos x {f} frames, "
          f"{'step ' + str(step) if step else 'random-init'})")
    result = {
        "retrieval_at_1": round(acc, 4), "chance": round(chance, 4),
        "num_videos": n, "frames": f, "dataset": args.dataset,
        "subset": args.retrieval_subset, "restored_step": step,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
