"""Standalone attention-overlay visualization.

Parity with reference ``visualizations/attention.py:7-23``: upsample the
attention-pool mask and alpha-blend it onto the source image. The overlay
math lives in ``panels.attention_overlay``; this script embeds val images
through a restored ``--use-attention`` VINCE checkpoint and writes a grid of
(image, overlay) blocks. Run:

    python -m vince_tpu.visualizations.attention \
        --title t --description d --use-attention \
        --dataset SyntheticVideoDataset --num-images 64 --output-dir attn
"""

import os
from typing import List

import numpy as np


def attention_grid(solver, dataset, num_images: int, batch_size: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from vince_tpu.utils.drawing import subplot
    from vince_tpu.visualizations.panels import attention_overlay

    blocks: List[np.ndarray] = []
    n = min(num_images, len(dataset))
    batch: List[np.ndarray] = []

    def flush():
        valid = len(batch)
        while len(batch) < batch_size:
            batch.append(batch[-1])
        arr = np.stack(batch)
        out = jax.device_get(solver.panel_fn(solver.state, jnp.asarray(arr)))
        masks = np.asarray(out["attention_masks"])
        h, w = arr.shape[1:3]
        for b in range(valid):
            pair = [arr[b], attention_overlay(arr[b], masks[b])]
            blocks.append(subplot(pair, 1, 2, w, h))
        batch.clear()

    for i in range(n):
        item = dataset[i]
        if item is None:  # tolerate failed reads; tail flushed after the loop
            continue
        img = item["data"][0] if item["data"].ndim == 4 else item["data"]
        batch.append(img)
        if len(batch) == batch_size:
            flush()
    if batch:
        flush()
    if not blocks:
        raise ValueError("no readable images in the dataset")
    h2, w2 = blocks[0].shape[:2]
    n_cols = max(int(np.sqrt(len(blocks))), 1)
    n_rows = int(np.ceil(len(blocks) / n_cols))
    return subplot(blocks, n_rows, n_cols, w2, h2, border=4)


def main():
    from vince_tpu.arg_parser import build_parser, finalize_args
    from vince_tpu.data import get_dataset
    from vince_tpu.solvers.vince_solver import VinceSolver

    parser = build_parser()
    parser.add_argument("--num-images", type=int, default=64)
    parser.add_argument("--output-dir", type=str, default="attention_viz")
    args = finalize_args(parser.parse_args())
    assert args.use_attention, "attention overlays need --use-attention"
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    solver = VinceSolver(args)
    dataset = get_dataset(args.dataset or "SyntheticVideoDataset")(args, "val")
    grid = attention_grid(solver, dataset, args.num_images, args.batch_size)
    os.makedirs(args.output_dir, exist_ok=True)
    import cv2

    out = os.path.join(args.output_dir, f"attention_{args.description}.jpg")
    cv2.imwrite(out, grid[:, :, ::-1])
    print("wrote", out)
    solver.end()


if __name__ == "__main__":
    main()
