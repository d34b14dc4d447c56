"""End-to-end: CLI args → VinceSolver → train iterations → val (kNN probe) →
checkpoint save/restore-resume. The TPU analog of the reference's debug launch
configs (train_vince_debug.sh), on the 8-device CPU mesh."""

import numpy as np
import pytest

from vince_tpu.arg_parser import build_parser, finalize_args


def _args(tmp_path, extra=()):
    argv = [
        "--title", "test", "--description", "e2e",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticVideoDataset",
        "--use-videos",
        "--inter-batch-comparison",
        "--num-frames", "2",
        "--batch-size", "16",
        "--input-width", "32", "--input-height", "32",
        "--vince-queue-size", "64",
        "--vince-embedding-size", "16",
        "--iterations-per-epoch", "3",
        "--epochs", "1",
        "--base-lr", "0.03",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4", "--mesh-queue-size", "2",
        "--num-workers", "2",
        "--synthetic-num-videos", "32",
        "--save-frequency", "2",
        "--cifar-data-path", str(tmp_path / "missing_{data_subset}.npz"),
        "--debug",
        *extra,
    ]
    return finalize_args(build_parser().parse_args(argv))

@pytest.fixture(scope="module")
def solver(tmp_path_factory, cpu_devices):
    from vince_tpu.solvers.vince_solver import VinceSolver

    tmp = tmp_path_factory.mktemp("e2e")
    args = _args(tmp)
    s = VinceSolver(args)
    yield s
    s.end()

def test_train_iterations_finite_loss(solver):
    solver.reset_epoch()
    metrics = None
    for _ in range(3):
        metrics = solver.run_train_iteration()
    assert np.isfinite(metrics["loss/nce_loss"])
    assert solver.iteration == 3 * 16
    assert int(np.asarray(solver.state.step)) == 3

def test_val_runs(solver):
    results = solver.run_val(max_seconds=30, max_batches=2)
    assert np.isfinite(results["loss/nce_loss"])
    assert "nce_accuracy" in results
    assert solver.last_val_batches == 2


def test_val_is_epoch_sized(solver):
    """Bare run_val = one pass over the val loader epoch (ceil(len/items)),
    not an arbitrary fixed batch count (reference loop shape :549-551)."""
    results = solver.run_val(max_seconds=60)
    # 32 synthetic videos / 8 items per batch = 4 batches
    assert solver.last_val_batches == solver._val_epoch_batches == 4
    assert np.isfinite(results["loss/nce_loss"])

def test_checkpoint_save_restore_resume(tmp_path, cpu_devices):
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path, extra=["--no-restore"])
    args.save = True
    s1 = VinceSolver(args)
    s1.reset_epoch()
    for _ in range(2):
        s1.run_train_iteration()
    s1.save()
    step1 = int(np.asarray(s1.state.step))
    s1.end()

    args2 = _args(tmp_path)
    args2.save = True
    s2 = VinceSolver(args2)
    assert int(np.asarray(s2.state.step)) == step1
    assert s2.iteration == step1 * args2.batch_size
    s2.reset_epoch()
    s2.run_train_iteration()
    assert int(np.asarray(s2.state.step)) == step1 + 1
    s2.end()

def test_cifar_knn_probe(tmp_path, cpu_devices):
    """kNN probe on synthetic color-class data: a random-init encoder already
    separates color classes well above chance (sanity of the probe path)."""
    from vince_tpu.data.synthetic_dataset import SyntheticImageDataset
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path)
    ds = SyntheticImageDataset(args, "train", num_images=200, num_classes=4)
    data, labels = ds.as_npz_arrays()
    npz_path = tmp_path / "cifar_train.npz"
    np.savez(npz_path, data=data, labels=labels)
    args.cifar_data_path = str(tmp_path / "cifar_{data_subset}.npz")
    s = VinceSolver(args)
    acc = s.run_cifar_knn()
    assert acc is not None and acc > 0.3  # 4 classes, chance = 0.25
    s.end()

def test_restored_queue_not_clobbered_and_fill_queue(tmp_path, cpu_devices):
    """(a) Resume must keep the checkpointed bank (our improvement over the
    reference's always-refill, SURVEY §5.4) rather than overwrite it with
    `fill_queue_repeat`; (b) `fill_queue` (reference vince_solver.py:293-313)
    fills from distinct batches, tags sources, and marks the ring full."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path, extra=["--no-restore"])
    args.save = True
    s1 = VinceSolver(args)
    s1.reset_epoch()
    for _ in range(2):
        s1.run_train_iteration()  # enqueues real keys → total > 0
    bank1 = np.asarray(s1.state.queue.vectors)
    total1 = int(np.asarray(s1.state.queue.total))
    assert total1 > 0
    s1.save()
    s1.end()

    args2 = _args(tmp_path)
    args2.save = True
    s2 = VinceSolver(args2)
    np.testing.assert_array_equal(np.asarray(s2.state.queue.vectors), bank1)
    assert int(np.asarray(s2.state.queue.total)) == total1

    s2.fill_queue()
    q = s2.state.queue
    assert int(np.asarray(q.total)) == args2.vince_queue_size  # marked full
    assert int(np.asarray(q.tail)) == 0
    srcs = np.asarray(q.sources)
    assert (srcs >= 0).all()  # every slot tagged by a real source
    norms = np.linalg.norm(np.asarray(q.vectors), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    s2.end()

def test_npz_image_dataset_moco_training(tmp_path, cpu_devices):
    """Single-frame MoCo on NPZ (CIFAR-shaped) files — BASELINE.json's
    CPU-runnable debug config: train iterations are finite and the same files
    drive the kNN probe."""
    from vince_tpu.data.synthetic_dataset import SyntheticImageDataset
    from vince_tpu.solvers.vince_solver import VinceSolver

    seed_args = _args(tmp_path)
    ds = SyntheticImageDataset(seed_args, "train", num_images=128, num_classes=4)
    data, labels = ds.as_npz_arrays()
    for subset in ("train", "val"):
        np.savez(tmp_path / f"cifar_{subset}.npz", data=data, labels=labels)

    args = _args(tmp_path, extra=[
        "--dataset", "NPZImageDataset", "--num-frames", "1",
    ])
    args.use_videos = False
    args.cifar_data_path = str(tmp_path / "cifar_{data_subset}.npz")
    s = VinceSolver(args)
    s.reset_epoch()
    for _ in range(2):
        m = s.run_train_iteration()
    assert np.isfinite(m["loss/nce_loss"])
    acc = s.run_cifar_knn()
    assert acc is not None and acc > 0.3
    s.end()


def test_log_images_emits_panels(solver):
    """log_images produces the input grid + NN panel through the panel
    forward, with the host image ring positionally mirroring the queue."""
    class FakeLogger:
        def __init__(self):
            self.images = {}

        def image_summary(self, tag, img, step):
            self.images[tag] = np.asarray(img)

    _, host_batches = solver.get_batch()
    saved = solver.train_logger
    fake = FakeLogger()
    solver.train_logger = fake
    try:
        solver.log_images(host_batches)
    finally:
        solver.train_logger = saved
    tags = list(fake.images)
    assert any("_inputs/" in t for t in tags), tags
    assert any("_outputs/" in t for t in tags), tags
    for img in fake.images.values():
        assert img.dtype == np.uint8 and img.ndim == 3

    # ring mirrors the device queue: same capacity, same tail
    assert solver.image_ring.maxsize == solver.cfg.queue_size
    assert solver.image_ring.tail == int(np.asarray(solver.state.queue.tail))


def test_save_cadence_survives_epoch_resets(tmp_path, cpu_devices):
    """Periodic saves key off the never-resetting global step: with
    save_frequency == iterations_per_epoch, every epoch boundary must
    produce a checkpoint (regression: gating on the per-epoch
    logger_iteration silenced ALL periodic saves in that configuration)."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path / "cadence", extra=["--no-restore"])
    args.save = True
    args.save_frequency = args.iterations_per_epoch  # worst case: 3 == 3
    s = VinceSolver(args)
    for _ in range(2):
        s.reset_epoch()
        for _ in range(args.iterations_per_epoch):
            s.run_train_iteration()
        s.epoch += 1
    steps = set(s.ckpt.manager.all_steps())
    assert {3, 6} <= steps, steps
    s.end()


def test_batch_prefetch_parity_and_lifecycle(tmp_path, cpu_devices):
    """The device-staging prefetch thread (reference prefetch_batches parity,
    vince_solver.py:340-374) must not change training numerics: with a
    single-worker loader (deterministic batch order) the per-step losses are
    identical with prefetch on (default) and off (--no-batch-prefetch)."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    def run(subdir, extra):
        args = _args(tmp_path / subdir,
                     extra=["--num-workers", "1", "--no-restore", *extra])
        args.save = False
        # repeatable mode: per-item deterministic frame jitter, so the batch
        # stream is bit-identical across runs no matter how loader threads
        # interleave on the global RNG
        args.repeatable = True
        s = VinceSolver(args)
        if "--no-batch-prefetch" in extra:
            assert s._prefetcher is None
        else:
            assert s._prefetcher is not None and s._prefetcher.running
        s.reset_epoch()
        losses = [float(s.run_train_iteration()["loss/nce_loss"])
                  for _ in range(3)]
        s.end()
        assert s._prefetcher is None  # stop_prefetch ran
        return losses

    on = run("prefetch_on", [])
    off = run("prefetch_off", ["--no-batch-prefetch"])
    assert on == off, (on, off)


def test_checkpoint_restore_across_mesh_shapes(tmp_path, cpu_devices):
    """Elastic resharding: a checkpoint written on one (data x queue) mesh
    restores onto a differently-factored mesh (Orbax reshards to the target
    shardings) and training continues. The reference's DataParallel
    checkpoints have no analog — GPU count is baked into nothing here."""
    import jax

    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path, extra=["--no-restore"])
    args.save = True
    s1 = VinceSolver(args)  # 4 x 2
    s1.reset_epoch()
    for _ in range(2):
        s1.run_train_iteration()
    s1.save()
    step1 = int(np.asarray(s1.state.step))
    ref_leaf = np.asarray(
        jax.device_get(s1.state.params["backbone"]["conv1"]["kernel"]))
    ref_queue = np.asarray(jax.device_get(s1.state.queue.vectors))
    s1.end()

    for dsz, qsz in ((2, 4), (8, 1)):
        args2 = _args(tmp_path, extra=[
            "--mesh-data-size", str(dsz), "--mesh-queue-size", str(qsz)])
        args2.save = True
        s2 = VinceSolver(args2)
        assert int(np.asarray(s2.state.step)) == step1, (dsz, qsz)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(
                s2.state.params["backbone"]["conv1"]["kernel"])),
            ref_leaf, err_msg=f"mesh {dsz}x{qsz}")
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(s2.state.queue.vectors)), ref_queue,
            err_msg=f"mesh {dsz}x{qsz}")
        s2.reset_epoch()
        metrics = s2.run_train_iteration()
        assert np.isfinite(metrics["loss/nce_loss"]), (dsz, qsz)
        s2.end()


@pytest.mark.parametrize("sides", ["alternate", "both"])
def test_jigsaw_sides_cli_modes(tmp_path, cpu_devices, sides):
    """--jigsaw-sides through the production CLI→solver path (the chip-soak
    configs in tools/chip_jigsaw_matrix.sh run exactly this code). `alternate`
    = reference parity (vince_solver.py:397-403 50/50 side choice, two
    compiled step variants); `both` = the shipped beyond-reference option
    (STATUS.md jigsaw table: the only random-perm mode that learns at toy
    scale) and must collapse to ONE compiled step used for every iteration.
    Both modes must train with finite loss and report the jigsaw metrics."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path / sides, extra=["--jigsaw", "--jigsaw-sides", sides])
    s = VinceSolver(args)
    try:
        assert s.cfg.jigsaw
        if sides == "both":
            assert s.train_step_jigsaw_q is s.train_step_jigsaw_k
        else:
            assert s.train_step_jigsaw_q is not s.train_step_jigsaw_k
        s.reset_epoch()
        metrics = None
        for _ in range(2):
            metrics = s.run_train_iteration()
        assert np.isfinite(metrics["loss/nce_loss"])
        assert int(np.asarray(s.state.step)) == 2
    finally:
        s.end()


def test_jigsaw_align_weight_cli(tmp_path, cpu_devices):
    """--jigsaw-align-weight through the production CLI→solver path: the
    round-5 remedy for the alternation cross-head blocker (PIRL-style
    same-image coupling). Both alternation step variants must train with
    finite loss and report the alignment channels."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path / "align",
                 extra=["--jigsaw", "--jigsaw-align-weight", "0.5"])
    s = VinceSolver(args)
    try:
        assert s.cfg.jigsaw_align_weight == 0.5
        s.reset_epoch()
        metrics = None
        # each iteration draws a 50/50 side (reference parity); the align
        # term is attached to BOTH compiled variants, so any draw covers it
        for _ in range(2):
            metrics = s.run_train_iteration()
        assert np.isfinite(metrics["loss/nce_loss"])
        assert "loss/nce_loss_align" in metrics, sorted(metrics)
        assert np.isfinite(metrics["loss/nce_loss_align"])
        assert 0.0 <= float(metrics["nce_accuracy_align"]) <= 1.0
    finally:
        s.end()


def test_jigsaw_warmup_steps_cli(tmp_path, cpu_devices):
    """--jigsaw-warmup-steps through the production CLI→solver path: the
    first N optimizer steps run the both-sides step (the mode that learns),
    then the loop switches to the reference's 50/50 alternation. Counted by
    wrapping the compiled step attributes the loop selects from."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path / "warmup",
                 extra=["--jigsaw", "--jigsaw-warmup-steps", "2"])
    s = VinceSolver(args)
    try:
        assert s.train_step_jigsaw_both is not s.train_step_jigsaw_q
        calls = {"both": 0, "alt": 0}

        def _wrap(fn, key):
            def inner(*a, **k):
                calls[key] += 1
                return fn(*a, **k)
            return inner

        s.train_step_jigsaw_both = _wrap(s.train_step_jigsaw_both, "both")
        s.train_step_jigsaw_q = _wrap(s.train_step_jigsaw_q, "alt")
        s.train_step_jigsaw_k = _wrap(s.train_step_jigsaw_k, "alt")
        s.reset_epoch()
        metrics = None
        for _ in range(3):
            metrics = s.run_train_iteration()
        assert calls == {"both": 2, "alt": 1}, calls
        assert np.isfinite(metrics["loss/nce_loss"])
    finally:
        s.end()


def test_jigsaw_warmup_mix_cli(tmp_path, cpu_devices):
    """--jigsaw-warmup-mix: during warmup, PLAIN steps interleave 50/50 with
    both-sides steps (so the plain projection co-trains — pure both-sides
    warmup leaves it random and the production-scale handoff collapses,
    docs/jigsaw_warmup_cli_r5.json). After warmup: reference alternation."""
    from vince_tpu.solvers.vince_solver import VinceSolver

    args = _args(tmp_path / "warmupmix",
                 extra=["--jigsaw", "--jigsaw-warmup-steps", "4",
                        "--jigsaw-warmup-mix"])
    s = VinceSolver(args)
    try:
        calls = {"both": 0, "plain": 0, "alt": 0}

        def _wrap(fn, key):
            def inner(*a, **k):
                calls[key] += 1
                return fn(*a, **k)
            return inner

        s.train_step_jigsaw_both = _wrap(s.train_step_jigsaw_both, "both")
        s.train_step = _wrap(s.train_step, "plain")
        s.train_step_jigsaw_q = _wrap(s.train_step_jigsaw_q, "alt")
        s.train_step_jigsaw_k = _wrap(s.train_step_jigsaw_k, "alt")
        s.reset_epoch()
        metrics = None
        for _ in range(5):
            metrics = s.run_train_iteration()
        # steps 0,2 both; 1,3 plain; 4 alternation
        assert calls == {"both": 2, "plain": 2, "alt": 1}, calls
        assert np.isfinite(metrics["loss/nce_loss"])
    finally:
        s.end()


def test_jigsaw_warmup_invariants(tmp_path):
    """--jigsaw-warmup-steps composes only with the alternating scheme."""
    with pytest.raises(AssertionError, match="jigsaw-warmup-steps requires"):
        _args(tmp_path, extra=["--jigsaw-warmup-steps", "100"])
    with pytest.raises(AssertionError, match="jigsaw-warmup-steps requires"):
        _args(tmp_path, extra=["--jigsaw", "--jigsaw-sides", "both",
                               "--jigsaw-warmup-steps", "100"])
    with pytest.raises(AssertionError, match="jigsaw-warmup-mix requires"):
        _args(tmp_path, extra=["--jigsaw", "--jigsaw-warmup-mix"])


def test_jigsaw_sides_without_jigsaw_rejected(tmp_path):
    """--jigsaw-sides without --jigsaw is a mis-typed command: the solver only
    consults jigsaw_sides when jigsaw is on, so silently training the plain
    path would waste a run (round-4 advisor finding)."""
    with pytest.raises(AssertionError, match="jigsaw-sides requires --jigsaw"):
        _args(tmp_path, extra=["--jigsaw-sides", "both"])
    # the default value stays legal without --jigsaw
    assert _args(tmp_path).jigsaw_sides == "alternate"
