"""Dataset mosaics + t-SNE image maps.

Parity with reference ``visualizations/dataset_mosaic.py``: 16×16 sample
mosaic (:27-60) and a t-SNE image map placing thumbnails at their 2-D embedding
coordinates (:127-143 — the ``dg_util.tsne.tsne_image`` equivalent, built on
sklearn TSNE).
"""

import os

import numpy as np


def sample_mosaic(dataset, rows: int = 16, cols: int = 16) -> np.ndarray:
    from vince_tpu.utils.drawing import subplot

    rng = np.random.RandomState(0)
    idx = rng.choice(len(dataset), min(rows * cols, len(dataset)), replace=False)
    images = []
    for i in idx:
        item = dataset[int(i)]
        if item is None:
            continue
        img = item["data"][0] if item["data"].ndim == 4 else item["data"]
        images.append(img)
    if not images:
        raise ValueError("no readable images in the dataset")
    h, w = images[0].shape[:2]
    return subplot(images, rows, cols, w, h)


def tsne_image(
    features: np.ndarray,
    images: np.ndarray,
    canvas_size: int = 4096,
    thumb: int = 64,
    perplexity: float = 30.0,
) -> np.ndarray:
    """Place thumbnails at their t-SNE coordinates (dg_util.tsne.tsne_image
    replacement, SURVEY.md §2.9)."""
    import cv2
    from sklearn.manifold import TSNE

    coords = TSNE(
        n_components=2, perplexity=min(perplexity, max(len(features) - 1, 1) / 3), init="pca"
    ).fit_transform(features.astype(np.float64))
    coords -= coords.min(axis=0)
    coords /= coords.max(axis=0) + 1e-9
    canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
    for (x, y), img in zip(coords, images):
        t = cv2.resize(np.asarray(img), (thumb, thumb))
        px = int(x * (canvas_size - thumb))
        py = int(y * (canvas_size - thumb))
        canvas[py : py + thumb, px : px + thumb] = t
    return canvas


def main():
    from vince_tpu.arg_parser import build_parser, finalize_args
    from vince_tpu.data import get_dataset
    from vince_tpu.solvers.vince_solver import VinceSolver
    from vince_tpu.visualizations.view_nearest_neighbors import embed_dataset

    parser = build_parser()
    parser.add_argument("--num-images", type=int, default=1024)
    parser.add_argument("--output-dir", type=str, default="mosaics")
    parser.add_argument("--with-tsne", action="store_true")
    args = finalize_args(parser.parse_args())
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import cv2

    dataset = get_dataset(args.dataset or "SyntheticVideoDataset")(args, "val")
    os.makedirs(args.output_dir, exist_ok=True)
    mosaic = sample_mosaic(dataset)
    cv2.imwrite(os.path.join(args.output_dir, "mosaic.jpg"), mosaic[:, :, ::-1])
    print("wrote mosaic.jpg")

    if args.with_tsne:
        solver = VinceSolver(args)
        images, feats = embed_dataset(solver, dataset, args.num_images, args.batch_size)
        canvas = tsne_image(feats, images, canvas_size=2048)
        cv2.imwrite(os.path.join(args.output_dir, "tsne.jpg"), canvas[:, :, ::-1])
        print("wrote tsne.jpg")
        solver.end()


if __name__ == "__main__":
    main()
