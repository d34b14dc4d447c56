"""Integration: VINCE contrastive pretraining actually learns on the synthetic
video dataset — NCE loss decreases and accuracy climbs well above its starting
point within a modest number of steps (SURVEY.md §4's "loss decreases" tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vince_tpu.data.loader import PersistentDataLoader
from vince_tpu.data.synthetic_dataset import SyntheticVideoDataset
from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers.vince_step import (
    SourceSpec,
    VinceConfig,
    init_vince_state,
    make_train_step,
    shard_state,
)


@pytest.mark.slow
def test_nce_learns_on_synthetic_videos(cpu_devices):
    class A:
        input_width = input_height = 32
        num_frames = 2
        batch_size = 32

    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=32, num_frames=2, source_id=1),),
        backbone="ResNet18",
        embed_size=32,
        image_size=32,
        queue_size=256,
        temperature=0.07,
        momentum=0.99,  # fast EMA so key encoder tracks early learning
        data_axis_size=4,
        queue_axis_size=2,
    )
    mesh = make_mesh(MeshSpec(4, 2))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.06, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
    step = make_train_step(cfg, opt, mesh)

    dataset = SyntheticVideoDataset(A(), "train", num_videos=64, num_images_to_return=2)
    loader = PersistentDataLoader(dataset, batch_size=16, num_workers=4)

    # NOTE: raw NCE loss is confounded early on — the random-init queue is
    # replaced by real (much harder) keys during the first ~8 steps, so loss
    # first RISES (standard MoCo dynamics). Learning is asserted on the
    # positive-vs-hardest-negative margin and NCE accuracy instead.
    accs, gaps = [], []
    for i in range(80):
        hb = loader.get_batch()
        batch = (
            {"data": jnp.asarray(hb["data"]), "queue_data": jnp.asarray(hb["queue_data"])},
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        metrics = jax.device_get(metrics)
        accs.append(float(metrics["nce_accuracy"]))
        gaps.append(float(metrics["cosine_sim"]) - float(metrics["cosine_sim_neg_max"]))
    loader.shutdown()

    assert np.mean(accs[-10:]) > np.mean(accs[:10]) + 0.15, (
        np.mean(accs[:10]), np.mean(accs[-10:]), accs[::8]
    )
    assert np.mean(gaps[-10:]) > np.mean(gaps[:10]), (gaps[:5], gaps[-5:])
