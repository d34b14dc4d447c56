"""End-to-end released-checkpoint pipeline (VERDICT round-1 item #2).

The reference publishes pretrained VINCE weights as a torch checkpoint tar
(``download_scripts/download_pretrained_weights_resnet18.sh:1-3``). This
sandbox has zero egress, so the released *values* are unreachable — instead
this test runs the **identical pipeline** on a reference-format torch
checkpoint with seeded values:

    torch state_dict on disk (reference key layout, incl. the
    ``feature_extractor.module.model.`` DataParallel prefixes)
      → tools/convert_reference_checkpoint.py (CLI path)
      → Orbax checkpoint dir
      → VinceSolver --restore --checkpoint-dir
      → converted-encoder embeddings match the torch forward to ≤1e-4
      → CIFAR-style kNN probe runs on the restored encoder.

On a networked host, pointing --torch-checkpoint at the released .pt is the
only remaining step; every subsequent stage is exercised here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _make_probe_npz(path, n=64, size=32, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    colors = rng.randint(0, 256, (classes, 3))
    labels = np.arange(n) % classes
    data = np.zeros((n, size, size, 3), np.uint8)
    for i, lab in enumerate(labels):
        img = np.ones((size, size, 3), np.int16) * colors[lab]
        img += rng.randint(-30, 31, img.shape)
        data[i] = np.clip(img, 0, 255)
    np.savez(path, data=data, labels=labels.astype(np.int64))
    return data, labels


def test_released_checkpoint_pipeline(tmp_path, cpu_devices):
    import jax
    import jax.numpy as jnp

    from tests.test_torch_forward_parity import TorchResNet18Features
    from tools.convert_reference_checkpoint import main as convert_main
    from vince_tpu.arg_parser import build_parser, finalize_args
    from vince_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
    from vince_tpu.solvers.vince_solver import VinceSolver

    # -- 1. reference-format torch checkpoint on disk ------------------------
    torch.manual_seed(3)
    backbone = TorchResNet18Features()
    with torch.no_grad():  # non-trivial BN running stats
        backbone.train()(torch.randn(8, 3, 64, 64) * 2 + 0.5)
    backbone.eval()
    embedding = tnn.Sequential(tnn.Linear(512, 512), tnn.ReLU(), tnn.Linear(512, 64)).eval()

    sd = {}
    for k, v in backbone.state_dict().items():
        sd["feature_extractor.module.model." + k] = v
    for k, v in embedding.state_dict().items():
        sd["embedding." + k] = v
    ckpt_pt = tmp_path / "vince_weights_resnet18.pt"
    torch.save(sd, ckpt_pt)

    # -- 2. CLI conversion ----------------------------------------------------
    conv_dir = tmp_path / "converted"
    convert_main([
        "--torch-checkpoint", str(ckpt_pt),
        "--output-dir", str(conv_dir),
        "--backbone", "ResNet18",
        "--embed-size", "64",
        "--queue-size", "64",
        "--image-size", "64",
    ])

    # -- 3. solver restore + probe -------------------------------------------
    npz_path = tmp_path / "probe_{data_subset}.npz"
    probe_path = str(tmp_path / "probe_train.npz")
    _make_probe_npz(probe_path)

    argv = [
        "--title", "wp", "--description", "conv",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticVideoDataset", "--use-videos",
        "--inter-batch-comparison",
        "--num-frames", "2", "--batch-size", "16",
        "--input-width", "64", "--input-height", "64",
        "--vince-queue-size", "64", "--vince-embedding-size", "64",
        "--iterations-per-epoch", "2", "--epochs", "1",
        "--base-lr", "0.03",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4",
        "--num-workers", "2",
        "--synthetic-num-videos", "16",
        "--compute-dtype", "float32",
        "--cifar-data-path", str(npz_path),
        "--checkpoint-dir", str(conv_dir),  # restore defaults on
        "--debug",
    ]
    args = finalize_args(build_parser().parse_args(argv))
    s = VinceSolver(args)
    try:
        assert int(np.asarray(s.state.step)) == 0

        # -- 4. feature parity ≤1e-4 vs the torch forward --------------------
        imgs, _ = _make_probe_npz(str(tmp_path / "parity.npz"), n=16, size=64, seed=9)
        emb, _ = s.embed_fn(s.state, jnp.asarray(imgs))
        emb = np.asarray(jax.device_get(emb))

        x = torch.from_numpy(imgs.astype(np.float32) / 255.0)
        mean = torch.tensor(IMAGENET_MEAN, dtype=torch.float32)
        std = torch.tensor(IMAGENET_STD, dtype=torch.float32)
        x = ((x - mean) / std).permute(0, 3, 1, 2)
        with torch.no_grad():
            feats = backbone(x)
            pooled = feats.mean(dim=(2, 3))
            proj = embedding(pooled)
            ref = (proj / proj.norm(dim=1, keepdim=True).clamp_min(1e-12)).numpy()
        np.testing.assert_allclose(emb, ref, atol=1e-4)

        # -- 5. kNN probe on the converted encoder ---------------------------
        acc = s.run_cifar_knn()
        assert acc is not None
        # 4 color-separable classes through a real converted encoder: must
        # beat chance (0.25) comfortably
        assert acc > 0.4, acc
    finally:
        s.end()
