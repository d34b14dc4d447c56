"""tools/eval_retrieval: frame-retrieval probe over the solver's embed_fn.

The CIFAR-kNN analog (reference ``vince_solver.py:651-693``) for the
procedural families: leave-one-out nearest-neighbor retrieval over F jittered
frames of N *val-split* (unseen-identity) videos. This smoke test drives the
random-init path on the CPU mesh and pins the result contract; the trained
delta is measured on the chip (tools/chip_session_r4.sh + STATUS.md).
"""


def test_eval_retrieval_random_init(tmp_path, cpu_devices):
    from tools.eval_retrieval import main

    result = main([
        "--title", "evalret_t", "--description", "r",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticTextureVideoDataset",
        "--backbone", "ResNet18",
        "--vince-embedding-size", "32", "--vince-queue-size", "256",
        "--input-width", "32", "--input-height", "32",
        "--num-frames", "2", "--use-videos", "--inter-batch-comparison",
        "--batch-size", "16", "--base-logdir", str(tmp_path / "logs"),
        "--mesh-data-size", "1", "--mesh-queue-size", "1",
        "--retrieval-videos", "6", "--retrieval-frames", "3",
        "--no-restore",
    ])
    assert 0.0 <= result["retrieval_at_1"] <= 1.0
    # chance = (F-1)/(N*F-1) for leave-one-out over N*F frames
    assert abs(result["chance"] - 2 / 17) < 1e-4  # dict rounds to 4 decimals
    assert result["restored_step"] == 0  # --no-restore → random-init baseline
    assert result["num_videos"] == 6 and result["frames"] == 3
