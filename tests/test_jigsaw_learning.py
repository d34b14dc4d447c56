"""Jigsaw (PIRL) learning evidence — VERDICT r2 #4.

The jigsaw pretrain variant (reference ``vince_model.py:144-171``: patchify →
per-patch backbone → perm-ordered concat → MLP head, NCE against the intact
key embedding) was the one pretrain path with no demonstrated learning signal
(the 1500-step hardware soak showed loss falling but only a weak accuracy
signal, consistent with PIRL's horizon). This file gives it a pass/fail
signal on a synthetic task where it CAN learn fast:

- Identity-coded images: each of 64 identities is a fixed 3×3 grid of 9
  distinct random colors. Query = jigsawed view, key = intact view, standard
  queue NCE (chance = 1/(queue+batch) ≈ 0.2%). The head must map ANY patch
  permutation of an identity near that identity's intact-key embedding, so
  NCE accuracy well above chance ⇒ gradients flow through JigsawHeads and the
  learned map is usefully permutation-invariant.

- Perm-sensitivity "trained direction": untrained, two different perms of the
  same image produce embeddings about as far apart as different images
  (invariance gap ≈ 0); after training the same-image/different-perm pairs
  must be far closer than cross-image pairs (gap ≫ 0).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vince_tpu.models.vince_model import VinceEncoder, jigsaw_patchify
from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers.vince_step import (
    SourceSpec,
    VinceConfig,
    build_encoder,
    init_vince_state,
    make_train_step,
    shard_state,
)

NUM_IDS = 64
CANVAS = 41  # int(36 / 0.875)
IMAGE = 36  # → 12² patches through the 3×3 patchify


def _identity_canvases(noise_rng=None):
    """[NUM_IDS, CANVAS, CANVAS, 3] uint8 — identity i is a fixed 3×3 grid of
    9 distinct random cell colors (the 'distinct per-cell textures' task)."""
    rs = np.random.RandomState(7)
    colors = rs.randint(0, 256, (NUM_IDS, 3, 3, 3), np.uint8)
    cell = -(-CANVAS // 3)  # ceil
    grid = np.repeat(np.repeat(colors, cell, axis=1), cell, axis=2)
    return grid[:, :CANVAS, :CANVAS, :]


def _make_cfg():
    return VinceConfig(
        sources=(SourceSpec("YT", batch_size=16, num_frames=1, source_id=1,
                            # flip+crop only: color identity survives the aug
                            transform="GOT10KTransform"),),
        backbone="ResNet18",
        embed_size=32,
        image_size=IMAGE,
        queue_size=512,
        temperature=0.07,
        momentum=0.99,
        jigsaw=True,
        inter_batch=True,
        data_axis_size=2,
        queue_axis_size=2,
        norm_kind="groupnorm",  # BN-noise-free at 8 rows/device
    )


def _perm_invariance_gap(cfg, params, canvases):
    """matched-minus-cross cosine gap: mean cos(e(x, p1), e(x, p2)) minus
    mean cos(e(x_i, p1), e(x_j, p2)) for i≠j. ≈0 when perms scramble the
    embedding as much as changing the image; →1 when the head is
    perm-invariant and identity-discriminative."""
    model = build_encoder(cfg)
    x = canvases[:16, :IMAGE, :IMAGE, :].astype(np.float32) / 255.0
    x = jnp.asarray((x - 0.45) / 0.225, jnp.float32)  # rough finalize analog
    patches = jigsaw_patchify(x)
    n = x.shape[0]
    perms = []
    for seed in (0, 1):
        k = jax.random.split(jax.random.PRNGKey(seed), n)
        perms.append(jax.vmap(lambda kk: jax.random.permutation(kk, 9))(k))
    embs = [
        np.asarray(
            model.apply({"params": params}, patches, train=False,
                        jigsaw=True, jigsaw_perm=p)["embeddings"]
        )
        for p in perms
    ]
    sim = embs[0] @ embs[1].T  # embeddings are L2-normalized
    matched = float(np.mean(np.diag(sim)))
    cross = float((sim.sum() - np.trace(sim)) / (n * n - n))
    return matched - cross, embs


@pytest.mark.slow
def test_jigsaw_nce_learns_above_chance(cpu_devices):
    cfg = _make_cfg()
    mesh = make_mesh(MeshSpec(2, 2))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.05, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
    step = make_train_step(cfg, opt, mesh, jigsaw_side="query")

    canvases = _identity_canvases()
    init_params = jax.device_get(state.params)
    gap_before, (e1, e2) = _perm_invariance_gap(cfg, init_params, canvases)
    # the perm input must actually reach the computation: different perms of
    # the same image give materially different untrained embeddings
    assert float(np.mean(np.abs(e1 - e2))) > 1e-3

    rs = np.random.RandomState(0)
    accs, losses = [], []
    for i in range(250):
        ids = rs.choice(NUM_IDS, 16, replace=False)
        batch = (
            {
                "data": jnp.asarray(canvases[ids]),
                "queue_data": jnp.asarray(canvases[ids]),
            },
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        metrics = jax.device_get(metrics)
        accs.append(float(metrics["nce_accuracy"]))
        losses.append(float(metrics["loss/nce_loss"]))

    assert all(np.isfinite(losses)), losses[::25]
    chance = 1.0 / (cfg.queue_size + 16)
    final_acc = float(np.mean(accs[-30:]))
    # chance ≈ 0.0019; demand ≥ 25× chance with a 0.05 absolute floor
    assert final_acc > max(25 * chance, 0.05), (final_acc, accs[::25])
    # and the signal must have CLIMBED (not been present at init)
    early_acc = float(np.mean(accs[5:35]))
    assert final_acc > early_acc + 0.02, (early_acc, final_acc, accs[::25])

    # trained direction: perm-invariance gap opens up substantially
    gap_after, _ = _perm_invariance_gap(cfg, jax.device_get(state.params), canvases)
    assert gap_after > gap_before + 0.2, (gap_before, gap_after)


@pytest.mark.slow
def test_plain_nce_learns_above_chance(cpu_devices):
    """Same identity-coded task through the PLAIN (non-jigsaw) path: NCE
    accuracy must climb far above the 1/(queue+batch) chance level in a
    bounded CI run — a hard accuracy signal (VERDICT r2 weak #7) on top of
    test_training_learns' soft proxies."""
    cfg = dataclasses.replace(_make_cfg(), jigsaw=False)
    mesh = make_mesh(MeshSpec(2, 2))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.05, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
    step = make_train_step(cfg, opt, mesh)

    canvases = _identity_canvases()
    rs = np.random.RandomState(0)
    accs = []
    for _ in range(200):
        ids = rs.choice(NUM_IDS, 16, replace=False)
        batch = (
            {
                "data": jnp.asarray(canvases[ids]),
                "queue_data": jnp.asarray(canvases[ids]),
            },
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        accs.append(float(jax.device_get(metrics["nce_accuracy"])))
    chance = 1.0 / (cfg.queue_size + 16)
    final_acc = float(np.mean(accs[-30:]))
    assert final_acc > max(50 * chance, 0.15), (final_acc, accs[::20])
    assert final_acc > float(np.mean(accs[5:35])) + 0.05, accs[::20]
