"""Tracking regressions (VERDICT round-1 item #8):

  - a golden-sequence test pinning ``TrackerSiamFC`` init/update outputs on a
    deterministic in-memory fixture (guards the displacement/scale-update
    math against silent numeric drift — reference siamfc_pytorch/tracker.py:
    113-205 semantics);
  - OTB-2015 path plumbing: a fabricated on-disk OTB layout must be picked up
    by ``OTBSequences``/``ExperimentOTB`` the moment real data is mounted.

Regenerate the golden fixture after an *intentional* behavior change with:
    JAX_PLATFORMS=cpu python -m tests.test_tracking_golden
"""

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "tracker_golden_boxes.npy")


def _golden_frames(num_frames: int = 5, size: int = 240, target: int = 48):
    """Deterministic moving-square frames, generated purely in numpy (no
    JPEG codec in the loop, so the fixture is byte-stable)."""
    rng = np.random.RandomState(7)
    bg = rng.randint(0, 100, (size, size, 3)).astype(np.uint8)
    color = np.array([220, 200, 120], np.uint8)
    x, y = 60.0, 90.0
    vx, vy = 2.5, -1.5
    frames, boxes = [], []
    for _ in range(num_frames):
        frame = bg.copy()
        xi, yi = int(round(x)), int(round(y))
        frame[yi : yi + target, xi : xi + target] = color
        frames.append(frame)
        boxes.append([x + 1, y + 1, target, target])  # 1-indexed xywh
        x += vx
        y += vy
    return frames, np.asarray(boxes)


def _golden_tracker():
    import jax
    import jax.numpy as jnp

    from vince_tpu.solvers.end_task_step import (
        EndTaskConfig,
        build_optimizer,
        init_end_task_state,
    )
    from vince_tpu.tracking.tracker import TrackerSiamFC

    cfg = EndTaskConfig(
        task="tracking",
        backbone="ResNet18SiamFCDilated",
        embed_size=16,
        num_classes=4,
        image_size=120,
        transform="GOT10KTransform",
        freeze_feature_extractor=True,
        compute_dtype=jnp.float32,
        data_axis_size=1,
    )
    opt = build_optimizer(cfg, 0.01, "sgd")
    state = init_end_task_state(jax.random.PRNGKey(0), cfg, opt)
    return TrackerSiamFC("golden", None, cfg, state)


def _run_golden():
    frames, gt = _golden_frames()
    tracker = _golden_tracker()
    tracker.init(frames[0], gt[0])
    out = [np.asarray(gt[0], np.float64)]
    for f in frames[1:]:
        out.append(np.asarray(tracker.update(f), np.float64))
    return np.stack(out)


def test_tracker_update_golden(cpu_devices):
    """Pinned update() trajectory: seeded encoder + fixed frames must
    reproduce the committed boxes (atol 1e-3 px absorbs libm-level noise
    only — any change to crop geometry, penalty/window math, or the box
    update breaks this)."""
    assert os.path.exists(GOLDEN_PATH), (
        f"golden fixture missing — generate with "
        f"JAX_PLATFORMS=cpu python -m tests.test_tracking_golden"
    )
    golden = np.load(GOLDEN_PATH)
    boxes = _run_golden()
    np.testing.assert_allclose(boxes, golden, atol=1e-3)


def test_otb_layout_plumbing(tmp_path):
    """Fabricated OTB-2015 directory layout (seq/img/*.jpg +
    groundtruth_rect.txt, comma- AND tab-separated variants) is discovered
    and parsed; ExperimentOTB prefers it over the synthetic fallback."""
    import cv2

    from vince_tpu.tracking.experiments import ExperimentOTB
    from vince_tpu.tracking.sequences import OTBSequences

    root = tmp_path / "otb100"
    for si, (name, delim) in enumerate((("Basketball", ","), ("Car4", "\t"))):
        seq = root / name / "img"
        seq.mkdir(parents=True)
        rng = np.random.RandomState(si)
        rows = []
        for fi in range(3):
            img = rng.randint(0, 255, (80, 100, 3), np.uint8)
            cv2.imwrite(str(seq / f"{fi + 1:04d}.jpg"), img)
            rows.append(delim.join(str(v) for v in (10 + fi, 20 + fi, 30, 40)))
        (root / name / "groundtruth_rect.txt").write_text("\n".join(rows) + "\n")

    seqs = OTBSequences(str(root))
    assert seqs.seq_names == ["Basketball", "Car4"]
    for i in range(len(seqs)):
        img_files, anno = seqs[i]
        assert len(img_files) == 3
        assert anno.shape == (3, 4)
        np.testing.assert_allclose(anno[0], [10, 20, 30, 40])

    class GTTracker:
        """Echoes ground truth — isolates the harness from model compute."""

        name = "gt_echo"

        def track(self, img_files, box):
            n = len(img_files)
            return np.tile(np.asarray(box, np.float64), (n, 1)), np.full(n, 1e-3)

    exp = ExperimentOTB(str(root), result_dir=str(tmp_path / "results"))
    assert isinstance(exp.sequences, OTBSequences)
    results = exp.run(GTTracker())
    # frame-0 box echoed all frames: near-perfect on frame 0, degrading after
    assert 0.0 <= results["success"] <= 1.0
    assert results["precision"] > 0.5
    assert os.path.exists(tmp_path / "results" / "gt_echo.json")
    # real OTB data must NOT carry the synthetic-fallback tag
    assert "synthetic" not in results


def test_synthetic_fallback_is_tagged(tmp_path):
    """When OTB data is absent, ExperimentOTB substitutes synthetic smoke
    sequences — the result dict must say so (VERDICT r3 weak #6: a downstream
    consumer must never log a fake 'OTB' precision as real)."""
    from vince_tpu.tracking.experiments import ExperimentOTB
    from vince_tpu.tracking.sequences import SyntheticSequences

    class GTTracker:
        name = "gt_echo_syn"

        def track(self, img_files, box):
            n = len(img_files)
            return np.tile(np.asarray(box, np.float64), (n, 1)), np.full(n, 1e-3)

    exp = ExperimentOTB(None, result_dir=str(tmp_path / "results"))
    assert isinstance(exp.sequences, SyntheticSequences)
    results = exp.run(GTTracker())
    assert results["synthetic"] is True
    assert results["num_sequences"] == len(exp.sequences)


if __name__ == "__main__":
    import jax

    # the sandbox sitecustomize forces jax_platforms back to "axon,cpu" after
    # import — the env var alone is not enough (CLAUDE.md); the fixture must
    # be generated on the same CPU backend the test runs on
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.save(GOLDEN_PATH, _run_golden())
    print(f"wrote {GOLDEN_PATH}")


def test_batched_tracker_matches_serial(cpu_devices):
    """BatchedTrackerSiamFC (N sequences in lockstep, VERDICT r2 #3) must
    reproduce the serial tracker's boxes on synthetic sequences — slots run
    the identical host-side crop/update code; only the device forward is
    batched. 3 sequences > 2 slots exercises the slot-refill path."""
    import jax
    import jax.numpy as jnp

    from vince_tpu.solvers.end_task_step import (
        EndTaskConfig, build_optimizer, init_end_task_state,
    )
    from vince_tpu.tracking.sequences import SyntheticSequences
    from vince_tpu.tracking.tracker import BatchedTrackerSiamFC, TrackerSiamFC

    cfg = EndTaskConfig(
        task="tracking", backbone="ResNet18SiamFCDilated", embed_size=16,
        num_classes=4, image_size=120, transform="GOT10KTransform",
        freeze_feature_extractor=True, compute_dtype=jnp.float32,
        data_axis_size=1,
    )
    opt = build_optimizer(cfg, 0.01, "sgd")
    state = init_end_task_state(jax.random.PRNGKey(0), cfg, opt)

    seqs = SyntheticSequences(num_seqs=3, num_frames=5, seed=3)
    sequences = [(seqs[i][0], seqs[i][1][0]) for i in range(3)]

    serial = TrackerSiamFC("serial", None, cfg, state)
    want = [serial.track(files, box)[0] for files, box in sequences]

    batched = BatchedTrackerSiamFC("batched", None, cfg, state, n_slots=2)
    got = batched.track_all(sequences)

    assert len(got) == 3
    for (boxes, times), ref in zip(got, want):
        np.testing.assert_allclose(boxes, ref, atol=1e-2)
        assert times.shape == (5,)


def test_batched_tracker_through_experiment(cpu_devices, tmp_path):
    """ExperimentOTB.run drives a track_all tracker over the whole benchmark
    in one lockstep pass and reports per-sequence metrics as before."""
    import jax
    import jax.numpy as jnp

    from vince_tpu.solvers.end_task_step import (
        EndTaskConfig, build_optimizer, init_end_task_state,
    )
    from vince_tpu.tracking.experiments import ExperimentOTB
    from vince_tpu.tracking.sequences import SyntheticSequences
    from vince_tpu.tracking.tracker import BatchedTrackerSiamFC

    cfg = EndTaskConfig(
        task="tracking", backbone="ResNet18SiamFCDilated", embed_size=16,
        num_classes=4, image_size=120, transform="GOT10KTransform",
        freeze_feature_extractor=True, compute_dtype=jnp.float32,
        data_axis_size=1,
    )
    opt = build_optimizer(cfg, 0.01, "sgd")
    state = init_end_task_state(jax.random.PRNGKey(1), cfg, opt)
    tracker = BatchedTrackerSiamFC("batched_exp", None, cfg, state, n_slots=4)
    exp = ExperimentOTB(
        None, result_dir=str(tmp_path / "results"),
        sequences=SyntheticSequences(num_seqs=3, num_frames=4, seed=4),
    )
    results = exp.run(tracker)
    assert set(results) >= {"precision", "success", "speed_fps"}
    assert os.path.exists(tmp_path / "results" / "batched_exp.json")
