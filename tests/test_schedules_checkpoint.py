"""LR schedule math (reference base_solver.py:107-129 + runner warmup) and the
Orbax checkpoint manager policy (keep-N, long-save, prefix remap)."""

import numpy as np
import jax.numpy as jnp

from vince_tpu.utils.checkpoint import CheckpointManager, _rename_tree
from vince_tpu.utils.schedules import vince_lr_schedule


def test_warmup_linear_first_500():
    s = vince_lr_schedule(0.03, epochs=200, iterations_per_epoch=5000, decay_type="cos")
    # reference solver_runner.py:36-43 — scale = min(1, it/500), it starts at 1
    np.testing.assert_allclose(float(s(0)), 0.03 / 500, rtol=1e-5)
    np.testing.assert_allclose(float(s(249)), 0.03 * 250 / 500, rtol=1e-5)
    np.testing.assert_allclose(float(s(499)), 0.03, rtol=1e-5)


def test_cosine_by_epoch():
    s = vince_lr_schedule(0.03, epochs=200, iterations_per_epoch=10, decay_type="cos",
                          use_warmup=False)
    np.testing.assert_allclose(float(s(0)), 0.03, rtol=1e-6)
    # epoch 100 of 200 → 0.5·(1+cos(π/2)) = 0.5
    np.testing.assert_allclose(float(s(100 * 10)), 0.015, rtol=1e-5, atol=1e-8)
    # final epoch ~ 0.5·(1+cos(199π/200))
    expected = 0.03 * 0.5 * (1 + np.cos(np.pi * 199 / 200))
    np.testing.assert_allclose(float(s(199 * 10)), expected, rtol=1e-3, atol=1e-8)


def test_step_schedule():
    s = vince_lr_schedule(0.03, epochs=200, iterations_per_epoch=10, decay_type="step",
                          step_schedule=(120, 160), use_warmup=False)
    np.testing.assert_allclose(float(s(119 * 10)), 0.03, rtol=1e-6)
    np.testing.assert_allclose(float(s(120 * 10)), 0.003, rtol=1e-5)
    np.testing.assert_allclose(float(s(160 * 10)), 0.0003, rtol=1e-5)


def test_checkpoint_keep_n_and_long_save(tmp_path):
    mgr = CheckpointManager(
        str(tmp_path / "roll"), str(tmp_path / "long"),
        max_to_keep=2, long_save_frequency=3,
    )
    state = {"params": {"w": jnp.ones((4,))}, "step": jnp.zeros((), jnp.int32)}
    for step in range(1, 8):
        state["step"] = jnp.asarray(step, jnp.int32)
        mgr.save(step, state)
    # rolling keeps the last 2
    assert mgr.manager.all_steps() == [6, 7]
    # every 3rd save is permanent: saves 3 and 6 → steps 3, 6
    assert mgr.long_manager.all_steps() == [3, 6]
    restored = mgr.restore(state)
    assert int(np.asarray(restored["step"])) == 7
    mgr.close()


def test_prefix_remap():
    tree = {"feature_extractor.backbone": 1, "embedding": 2}
    out = _rename_tree(tree, ["feature_extractor."], ["encoder."])
    assert out == {"encoder.backbone": 1, "embedding": 2}
    # no-op when no prefixes
    assert _rename_tree(tree, [""], [""]) == tree


def test_restore_none_when_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"), None)
    assert mgr.restore({"a": jnp.zeros((1,))}) is None
    mgr.close()
