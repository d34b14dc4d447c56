"""Drive the actual CLI entry (`solver_runner.main`) in-process: the
reference's runner contract — --test-first initial val, epoch loop, periodic
saves, tensorboard artifacts, crash-save in finally (solver_runner.py:26-54)."""

import glob
import os

import numpy as np


def test_runner_end_to_end(tmp_path, cpu_devices):
    from vince_tpu.solver_runner import main

    argv = [
        "--title", "runner_t", "--description", "rt",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticVideoDataset", "--use-videos",
        "--inter-batch-comparison", "--num-frames", "2",
        "--batch-size", "16",
        "--input-width", "32", "--input-height", "32",
        "--vince-queue-size", "64", "--vince-embedding-size", "16",
        "--iterations-per-epoch", "3", "--epochs", "2",
        "--base-lr", "0.03",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4", "--mesh-queue-size", "2",
        "--num-workers", "2", "--synthetic-num-videos", "16",
        "--save-frequency", "3",
        "--test-first",
    ]
    main(argv)

    # periodic saves at the epoch boundaries (global steps 3 and 6)
    ckpt_root = os.path.join(tmp_path, "runner_t", "checkpoints_rt")
    steps = sorted(
        int(os.path.basename(d))
        for d in glob.glob(os.path.join(ckpt_root, "*"))
        if os.path.basename(d).isdigit()
    )
    assert 3 in steps and 6 in steps, steps

    # tensorboard event files for train and val
    for split in ("train", "val"):
        events = glob.glob(
            os.path.join(tmp_path, "runner_t", "tensorboard", "*", split, "events.*")
        )
        assert events, split
        assert os.path.getsize(events[0]) > 0

    # resume: re-running a COMPLETED 2-epoch config trains nothing further
    main(argv)
    steps_same = sorted(
        int(os.path.basename(d))
        for d in glob.glob(os.path.join(ckpt_root, "*"))
        if os.path.basename(d).isdigit()
    )
    assert max(steps_same) == 6, steps_same

    # raising --epochs resumes from step 6 and continues to 9 and 12
    argv2 = [("4" if a == "2" and argv[i - 1] == "--epochs" else a)
             for i, a in enumerate(argv)]
    main(argv2)
    steps2 = sorted(
        int(os.path.basename(d))
        for d in glob.glob(os.path.join(ckpt_root, "*"))
        if os.path.basename(d).isdigit()
    )
    assert max(steps2) >= 12, steps2


def test_runner_crash_saves_and_exits_nonzero(tmp_path, cpu_devices, monkeypatch):
    """A mid-training exception triggers the crash-save (reference
    solver_runner.py:49-54 finally) AND a non-zero exit, so shell drivers
    see the failure."""
    import pytest

    from vince_tpu.solver_runner import main
    from vince_tpu.solvers.vince_solver import VinceSolver

    calls = {"n": 0}
    orig = VinceSolver.run_train_iteration

    def boom(self):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("synthetic mid-training failure")
        return orig(self)

    monkeypatch.setattr(VinceSolver, "run_train_iteration", boom)
    argv = [
        "--title", "crash_t", "--description", "cr",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticVideoDataset", "--use-videos",
        "--inter-batch-comparison", "--num-frames", "2",
        "--batch-size", "16",
        "--input-width", "32", "--input-height", "32",
        "--vince-queue-size", "64", "--vince-embedding-size", "16",
        "--iterations-per-epoch", "3", "--epochs", "1",
        "--base-lr", "0.03",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4", "--mesh-queue-size", "2",
        "--num-workers", "2", "--synthetic-num-videos", "16",
        "--save-frequency", "100",
    ]
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code == 1
    # the crash-save wrote a checkpoint at the step the failure hit
    ckpt_root = os.path.join(tmp_path, "crash_t", "checkpoints_cr")
    steps = [d for d in glob.glob(os.path.join(ckpt_root, "*"))
             if os.path.basename(d).isdigit()]
    assert steps, ckpt_root
