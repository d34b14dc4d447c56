#!/usr/bin/env python
"""Batch embedding extraction — the serving-side use of a trained encoder.

Embeds a directory tree of JPEG frames (or a registered dataset) through a
restored VINCE encoder and writes ``embeddings.npz`` with L2-normalized
``embeddings [N, D] float32`` plus the ``paths``/indices they came from —
the artifact behind retrieval / nearest-neighbor / probe workflows (what the
reference rebuilds ad hoc inside ``visualizations/view_nearest_neighbors.py``
and ``end_tasks/``).

    python tools/extract_embeddings.py \
        --title t --description d --checkpoint-dir ckpts/ \
        --input-dir /data/frames --output embeddings.npz

Decodes with the native C++ pool when available (``--native-decode``),
falling back to the cv2 path per file. Images are resized to the model
canvas and center-cropped exactly like the val transform.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JPEG_EXTS = (".jpg", ".jpeg", ".JPG", ".JPEG")


def list_images(root: str):
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(JPEG_EXTS):
                out.append(os.path.join(dirpath, f))
    out.sort()
    return out


def center_crop(img, size: int):
    h, w = img.shape[:2]
    y0, x0 = max((h - size) // 2, 0), max((w - size) // 2, 0)
    return img[y0:y0 + size, x0:x0 + size]


def decode_batch(paths, canvas: int, use_native: bool):
    """[B] file paths → [B, canvas, canvas, 3] uint8 + ok mask."""
    import numpy as np

    if use_native:
        from vince_tpu import native

        pool = decode_batch._pool
        if pool is None:
            pool = decode_batch._pool = native.DecodePool()
        return pool.decode_files(list(paths), canvas)
    import cv2

    out = np.zeros((len(paths), canvas, canvas, 3), np.uint8)
    oks = np.zeros(len(paths), bool)
    for i, p in enumerate(paths):
        bgr = cv2.imread(p, cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        out[i] = cv2.resize(bgr[:, :, ::-1], (canvas, canvas),
                            interpolation=cv2.INTER_LINEAR)
        oks[i] = True
    return out, oks


decode_batch._pool = None


def main(argv=None):
    from vince_tpu.arg_parser import build_parser, finalize_args

    parser = build_parser()
    parser.add_argument("--input-dir", default=None,
                        help="directory tree of JPEGs; omit to embed the "
                             "--dataset val split instead")
    parser.add_argument("--output", default="embeddings.npz")
    parser.add_argument("--num-images", type=int, default=0,
                        help="cap (0 = all)")
    args = finalize_args(parser.parse_args(argv))
    args.disable_dataloader = True  # no train loaders / queue prefill
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vince_tpu.solvers.vince_solver import VinceSolver

    solver = VinceSolver(args)
    size = args.input_width
    bs = args.batch_size

    def embed(arr):  # [B, S, S, 3] uint8 → [B, D] float32 (L2-normalized)
        emb, _ = solver.embed_fn(solver.state, jnp.asarray(arr))
        return np.asarray(jax.device_get(emb), np.float32)

    embeddings, names = [], []
    if args.input_dir:
        paths = list_images(args.input_dir)
        if args.num_images:
            paths = paths[: args.num_images]
        if not paths:
            raise SystemExit(f"no JPEGs under {args.input_dir}")
        canvas = int(np.ceil(size / 0.875))
        for i in range(0, len(paths), bs):
            chunk = paths[i:i + bs]
            imgs, oks = decode_batch(
                chunk, canvas, getattr(args, "native_decode", False))
            imgs = np.stack([center_crop(im, size) for im in imgs])
            if len(chunk) < bs:  # pad the tail batch (jit shape is fixed)
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], bs - len(chunk), 0)])
            emb = embed(imgs)[: len(chunk)]
            embeddings.append(emb[np.asarray(oks)])
            names.extend(p for p, ok in zip(chunk, oks) if ok)
    else:
        from vince_tpu.data import get_dataset
        from vince_tpu.visualizations.view_nearest_neighbors import embed_dataset

        dataset = get_dataset(args.dataset or "SyntheticVideoDataset")(args, "val")
        n = args.num_images or len(dataset)
        _, emb = embed_dataset(solver, dataset, n, bs)
        embeddings.append(np.asarray(emb, np.float32))
        names.extend(str(i) for i in range(len(emb)))

    solver.end()
    emb = np.concatenate(embeddings) if embeddings else np.zeros((0, 0))
    np.savez(args.output, embeddings=emb, paths=np.asarray(names))
    print(f"wrote {args.output}: {emb.shape[0]} embeddings of dim "
          f"{emb.shape[1] if emb.ndim == 2 and emb.shape[0] else 0}")


if __name__ == "__main__":
    main()
