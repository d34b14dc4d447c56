"""End-task solvers: classifier probe learns synthetic classes, kinetics LSTM
step runs, tracking step + tracker inference + OTB harness run end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.arg_parser import build_parser, finalize_args


def _args(tmp_path, extra=()):
    argv = [
        "--title", "ettest", "--description", "et",
        "--batch-size", "16",
        "--input-width", "32", "--input-height", "32",
        "--vince-embedding-size", "16",
        "--end-task-classifier-num-classes", "4",
        "--iterations-per-epoch", "4",
        "--epochs", "1",
        "--base-lr", "0.01",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4",
        "--num-workers", "2",
        "--freeze-feature-extractor",
        "--no-restore",
        "--debug",
        *extra,
    ]
    return finalize_args(build_parser().parse_args(argv))


def test_classifier_solver_learns(tmp_path, cpu_devices):
    from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver

    # --no-warmup: the LR schedule (incl. the 500-iteration warmup the
    # reference applies to end tasks too) now lives inside the jitted
    # optimizer; this test checks learning speed at full LR
    args = _args(tmp_path, ["--dataset", "SyntheticImageDataset",
                            "--base-lr", "0.05", "--no-warmup"])
    s = EndTaskSunSceneSolver(args)
    s.reset_epoch()
    accs = []
    for _ in range(20):
        m = s.run_train_iteration()
        accs.append(float(np.asarray(m["classifier_accuracy_0"])))
    # color-coded 4-class data through a frozen random encoder: the linear
    # probe should climb well above chance (0.25) despite color-jitter aug
    assert np.mean(accs[-5:]) > 0.45, accs
    res = s.run_val(max_batches=2)
    assert np.isfinite(res["loss/classifier_loss_0"])
    s.end()


def test_full_epoch_val_covers_whole_split(tmp_path, cpu_devices):
    """run_val with no cap = exactly one pass: ceil(len(val)/B) batches, every
    sample counted once, padded final batch weighted by its valid rows
    (reference end_task_base_solver.py:305-417; VERDICT round-1 item #3)."""
    from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver

    # batch 24 (items=24, mesh 4): 512 % 24 != 0 → exercises final-batch padding
    args = _args(tmp_path, ["--dataset", "SyntheticImageDataset", "--batch-size", "24"])
    s = EndTaskSunSceneSolver(args)
    res = s.run_val()
    ds = s._make_dataset("val")
    items = s._items_per_batch()
    assert s.last_val_batches == int(np.ceil(len(ds) / items))
    assert s.last_val_samples == len(ds)
    assert np.isfinite(res["loss/classifier_loss_0"])
    assert 0.0 <= res["classifier_accuracy_0"] <= 1.0

    # run_eval rebuilds the loader and covers the same full split
    res2 = s.run_eval()
    assert s.last_val_samples == len(ds)
    assert np.isfinite(res2["loss/classifier_loss_0"])
    s.end()


def test_kinetics_solver_runs(tmp_path, cpu_devices):
    from vince_tpu.solvers.end_task_solvers import EndTaskKinetics400Solver

    args = _args(
        tmp_path,
        ["--dataset", "SyntheticClipDataset", "--num-frames", "2", "--base-lr", "0.02"],
    )
    s = EndTaskKinetics400Solver(args)
    s.reset_epoch()
    accs = []
    for _ in range(20):
        m = s.run_train_iteration()
        accs.append(float(np.asarray(m["classifier_accuracy_0"])))
    assert np.isfinite(np.asarray(m["loss/classifier_loss_0"]))
    # color-separable 4-class clips: the LSTM head must learn above chance
    # (0.25) — this also guards clip↔label alignment (a mis-reshape breaks
    # learning entirely, pinning accuracy at ~chance)
    assert np.mean(accs[-6:]) > 0.35, accs
    s.end()


def test_tracking_solver_and_otb_eval(tmp_path, cpu_devices):
    from vince_tpu.solvers.end_task_solvers import EndTaskTrackingSolver

    args = _args(
        tmp_path,
        [
            "--dataset", "GOT10kDataset",
            "--backbone", "ResNet18SiamFCDilated",
            "--batch-size", "4",
            "--input-width", "120", "--input-height", "120",
            "--mesh-data-size", "4",
        ],
    )
    s = EndTaskTrackingSolver(args)
    s.reset_epoch()
    m = s.run_train_iteration()
    assert np.isfinite(np.asarray(m["loss/siam_tracking_loss"]))

    import os
    os.chdir(tmp_path)  # keep results/ out of the repo
    results = s.run_eval()  # synthetic sequences (no OTB data on disk)
    assert 0.0 <= results["precision"] <= 1.0
    assert 0.0 <= results["success"] <= 1.0
    s.end()


def test_tracking_label_geometry():
    """SiamFC transforms produce 247px search crops and 17×17 L1-ball labels
    (reference cfg: response 17, positive width 5)."""
    from vince_tpu.data.got10k_dataset import make_pair_transform
    from vince_tpu.tracking.sequences import SyntheticSequences
    from vince_tpu.tracking.ops import read_image

    seqs = SyntheticSequences(num_seqs=1, num_frames=4)
    img_files, anno = seqs[0]
    t = make_pair_transform()
    z_img = read_image(img_files[0])
    x_img = read_image(img_files[1])
    z, (x, label) = t((z_img, x_img, anno[0], anno[1]))
    assert z.shape == (120, 120, 3)
    assert x.shape == (247, 247, 3)
    assert label.shape == (17, 17)
    assert 0 < label.sum() <= 41  # L1 ball of radius 2.5 → 13..25 positives


def test_focal_loss_and_xcorr():
    import jax.numpy as jnp
    from vince_tpu.ops.xcorr import fast_xcorr
    from vince_tpu.tracking.losses import balanced_loss, focal_loss, ghmc_loss, ohnm_loss

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 3, 3, 8).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 7, 7, 8).astype(np.float32))
    r = fast_xcorr(z, x, out_scale=1e-3)
    assert r.shape == (2, 5, 5, 1)
    # oracle: direct correlation at one offset
    manual = float(np.sum(np.asarray(z)[0] * np.asarray(x)[0, 1:4, 2:5])) * 1e-3
    np.testing.assert_allclose(float(r[0, 1, 2, 0]), manual, rtol=1e-4)

    logits = jnp.asarray(rng.randn(4, 17, 17).astype(np.float32))
    labels = jnp.asarray((rng.rand(4, 17, 17) < 0.1).astype(np.float32))
    for fn in (focal_loss, balanced_loss, ohnm_loss):
        val = float(fn(logits, labels))
        assert np.isfinite(val) and val > 0
    loss, acc_sum = ghmc_loss(logits, labels)
    assert np.isfinite(float(loss)) and acc_sum.shape == (30,)


def test_finetune_updates_encoder(tmp_path, cpu_devices):
    """Without --freeze-feature-extractor the encoder must be fine-tuned
    (reference end_task_base_solver.py:83-90 adds its param group); with the
    flag it must stay bit-identical."""
    import jax
    from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver

    def leaf0(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0])

    argv = ["--dataset", "SyntheticImageDataset", "--base-lr", "0.05"]
    args = _args(tmp_path / "ft", argv)
    args.freeze_feature_extractor = False
    s = EndTaskSunSceneSolver(args)
    before = jax.tree_util.tree_map(np.asarray, s.state.encoder_params)
    s.reset_epoch()
    for _ in range(2):
        m = s.run_train_iteration()
    assert np.isfinite(m["loss/total_loss"])
    after = s.state.encoder_params
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        )
    )
    assert changed, "encoder params did not update in fine-tune mode"
    s.end()

    args2 = _args(tmp_path / "fr", argv)
    s2 = EndTaskSunSceneSolver(args2)
    before2 = leaf0(s2.state.encoder_params)
    s2.reset_epoch()
    s2.run_train_iteration()
    np.testing.assert_array_equal(before2, leaf0(s2.state.encoder_params))
    s2.end()


def test_end_task_restores_pretrain_encoder(tmp_path, cpu_devices):
    """The end-task encoder must come from the VINCE pretrain checkpoint
    (reference setup_feature_extractor, end_task_base_solver.py:112-129),
    found via --checkpoint-dir / the shared title+description convention."""
    import jax
    from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver
    from vince_tpu.solvers.vince_solver import VinceSolver
    from tests.test_solver_e2e import _args as vince_args

    # 1 pretrain step + save (title/description shared with the end task)
    pargs = vince_args(tmp_path, extra=["--no-restore", "--vince-embedding-size", "16"])
    pargs.save = True
    pre = VinceSolver(pargs)
    pre.reset_epoch()
    pre.run_train_iteration()
    pre.save()
    pre_backbone = jax.tree_util.tree_map(np.asarray, pre.state.params["backbone"])
    pre.end()

    eargs = _args(tmp_path, [
        "--dataset", "SyntheticImageDataset",
        "--title", "test", "--description", "e2e",  # match the pretrain run
        "--vince-embedding-size", "16",
    ])
    eargs.restore = True  # _args defaults to --no-restore
    s = EndTaskSunSceneSolver(eargs)
    got = s.state.encoder_params["backbone"]
    for a, b in zip(
        jax.tree_util.tree_leaves(pre_backbone), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s.end()


def test_end_task_prefetch_lifecycle(tmp_path, cpu_devices):
    """Prefetch starts lazily on the first train iteration (eval-only runs
    never stage train batches), feeds converted batches, and stops on end()."""
    from vince_tpu.solvers.end_task_solvers import EndTaskSunSceneSolver

    args = _args(tmp_path, ["--dataset", "SyntheticImageDataset"])
    s = EndTaskSunSceneSolver(args)
    assert s._prefetcher is None  # not started by construction
    s.reset_epoch()
    m = s.run_train_iteration()
    assert s._prefetcher is not None and s._prefetcher.running
    assert np.isfinite(np.asarray(m["classifier_accuracy_0"]))
    s.run_train_iteration()
    s.end()
    assert s._prefetcher is None

    # opt-out path stays synchronous
    args2 = _args(tmp_path, ["--dataset", "SyntheticImageDataset",
                             "--no-batch-prefetch"])
    s2 = EndTaskSunSceneSolver(args2)
    s2.reset_epoch()
    s2.run_train_iteration()
    assert s2._prefetcher is None
    s2.end()


def test_end_task_optimizer_follows_schedule():
    """The epoch decay + warmup schedule applies inside the jitted end-task
    optimizer (reference decays every param group per epoch,
    base_solver.py:107-129) — per-head scales multiply the decayed value."""
    import optax  # noqa: F401  (schedule path exercises scale_by_schedule)

    from vince_tpu.solvers.end_task_step import EndTaskConfig, build_optimizer

    cfg = EndTaskConfig(task="classifier", freeze_feature_extractor=True,
                        head_lr_scales=(1.0, 0.01))
    sched = lambda step: 0.1 * (0.5 ** step)  # noqa: E731
    opt = build_optimizer(cfg, 0.1, "sgd", schedule=sched)
    params = {"decoder": {"classifier_0": jnp.ones((3,)),
                          "classifier_1": jnp.ones((3,))},
              "encoder": {"w": jnp.ones((3,))}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    st = opt.init(params)
    u0, st = opt.update(grads, st, params)
    u1, st = opt.update(grads, st, params)
    # SGD momentum 0.9: step0 = -lr(0)·g; step1 = -lr(1)·(1.9·g)
    np.testing.assert_allclose(np.asarray(u0["decoder"]["classifier_0"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1["decoder"]["classifier_0"]), -0.05 * 1.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u0["decoder"]["classifier_1"]), -0.001, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u0["encoder"]["w"]), 0.0)
