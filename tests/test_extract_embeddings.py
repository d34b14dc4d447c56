"""tools/extract_embeddings: directory tree → L2-normalized embedding npz
(the serving-side artifact behind retrieval/NN/probe workflows)."""

import os

import cv2
import numpy as np


def _write_jpgs(root, n=6):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = cv2.resize(rng.randint(0, 256, (12, 16, 3), np.uint8),
                         (160, 120), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, f"f{i:03d}.jpg"), img)


def test_extract_embeddings_dir(tmp_path, cpu_devices):
    from tools.extract_embeddings import main

    img_dir = tmp_path / "imgs" / "sub"
    _write_jpgs(str(img_dir))
    out = tmp_path / "emb.npz"
    main([
        "--title", "emb_t", "--description", "emb",
        "--solver", "VinceSolver",
        "--batch-size", "4", "--input-width", "32", "--input-height", "32",
        "--vince-queue-size", "32", "--vince-embedding-size", "16",
        "--base-lr", "0.03", "--base-logdir", str(tmp_path / "logs"),
        "--mesh-data-size", "4", "--mesh-queue-size", "2",
        "--num-workers", "1", "--no-restore",
        "--input-dir", str(tmp_path / "imgs"), "--output", str(out),
    ])
    z = np.load(out)
    emb, paths = z["embeddings"], z["paths"]
    assert emb.shape == (6, 16)
    # deterministic file order + L2-normalized rows
    assert list(paths) == sorted(paths)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)
