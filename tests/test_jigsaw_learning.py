"""Jigsaw (PIRL) learning evidence — VERDICT r2 #4.

The jigsaw pretrain variant (reference ``vince_model.py:144-171``: patchify →
per-patch backbone → perm-ordered concat → MLP head, NCE against the intact
key embedding) was the one pretrain path with no demonstrated learning signal
(the 1500-step hardware soak showed loss falling with only a weak accuracy
signal, consistent with PIRL's horizon). This file gives it a pass/fail
signal at the level where the permutation actually enters the computation,
plus bounded full-path evidence:

1. ``test_jigsaw_heads_learn_perm_invariant_nce`` — HARD accuracy signal:
   ``JigsawHeads`` trained with jigsaw-NCE on synthetic patch features (the
   "distinct per-cell textures" task distilled to the head's actual inputs)
   must climb far above chance AND open a perm-invariance gap: untrained,
   two perms of one identity embed ~as far apart as two identities; trained,
   same-identity/different-perm pairs must be far closer. That is exactly
   "output depends on the permutation in the trained direction".

2. ``test_jigsaw_full_path_trains`` — the full mesh train step (patchify →
   ResNet18 → JigsawHeads → sharded queue NCE, both jigsaw sides) makes
   bounded progress: finite loss that falls from its untrained value, and
   the perm input demonstrably reaches the embedding.

   Measured bound documented here (5 configs: lr 0.01/0.02/0.05, τ 0.07/0.2,
   SGD/Adam, head-only masking, reference-style 50/50 side alternation —
   each 150-300 steps on the 2×2 CPU mesh): at toy scale (36² images,
   batch 16) the full path stays in the MoCo collapse-then-spread phase and
   does NOT reach accuracy above chance within 300 steps — same finding as
   the 1500-step chip soak at production scale. PIRL-horizon behavior, not
   a gradient-flow defect: the head-level test isolates and passes the
   mechanism the full path trains too slowly to show in CI.

3. ``test_plain_nce_learns_above_chance`` — the same identity-coded task
   through the PLAIN path climbs far above chance (hard accuracy signal,
   VERDICT r2 weak #7). Validated trajectory: 0.06 → 0.29 mean30 at 100
   steps (lr 0.01; lr 0.05 collapses — anisotropic argmax pins accuracy at
   exactly 1/16, the tie artifact the pool-size note below explains).

Round-4 long-horizon chip soaks settle the "PIRL-horizon" hypothesis with a
controlled negative (docs/jigsaw_{soak,plain,best}_r4.json, STATUS.md):
at the round-3 config (lr 0.01, m 0.99, b 32) BOTH paths collapse (jigsaw to
exactly uniform softmax, plain to the 1/batch tie-pin), so that config proves
nothing; at a config where the PLAIN path demonstrably sustains (lr 0.003,
m 0.999 → 0.58 acc in 4k steps), 16k jigsaw steps optimize the loss to well
below uniform but never separate the positive from the hardest negative
(cosine_sim ≈ cosine_sim_neg_max, acc ≤ 1/batch). The jigsaw mechanism is
proven here at head level; the full-path objective needs PIRL's real-data
scale to pay off, and at toy scale its measured value is null.

A second control session pinpoints WHICH ingredient blocks toy-scale
learning (docs/jigsaw_{idperm,both,both_idperm}_r4.json, STATUS.md): with
the jigsaw head on BOTH sides and identity perms the path matches plain
exactly (0.59 vs 0.58 in 4k steps — the patchify/per-patch-backbone/head
pipeline costs nothing); both-sides with random perms still learns (0.35);
but the reference's 50/50 alternation stays near chance EVEN WITH identity
perms (0.012). The blocker is the cross-head alignment of the alternating
scheme (jigsaw-head embedding scored against the plain embedding), not
permutation invariance.

The identity pool must be ≫ the 512-entry queue: with a small pool the bank
fills with stale key copies of the SAME identities, each an exact-tie
"negative" the positive cannot beat (``sims > neg_max`` is strict) —
measured: accuracy pins at exactly 1/16 with a 64-identity pool. 4096 ids
over ≤180 steps ⇒ ~1% of queue rows duplicate a batch identity.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vince_tpu.models import heads
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

NUM_IDS = 4096
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


def test_jigsaw_heads_learn_perm_invariant_nce():
    """JigsawHeads learns the permutation-invariant identity map under
    jigsaw-NCE — the hard accuracy-above-chance signal for the jigsaw
    mechanism (reference vince_model.py:161-171's head, trained exactly as
    the step trains it: query = head(permuted patch features), key = fixed
    intact-readout embedding, softmax CE over all identities)."""
    n_ids, slots, feat, embed = 256, 9, 64, 32
    rs = np.random.RandomState(0)
    # identity i's per-slot features (what the per-patch backbone hands the
    # head); slot content is the identity signal, order is the nuisance
    patch_feats = jnp.asarray(rs.randn(n_ids, slots, feat), jnp.float32)
    # intact-side key embeddings: fixed perm-invariant readout (mean over
    # slots then a fixed random projection), L2-normalized — the stand-in
    # for the stop-gradient EMA key path
    w_key = jnp.asarray(rs.randn(feat, embed) / np.sqrt(feat), jnp.float32)
    keys = jnp.mean(patch_feats, axis=1) @ w_key
    keys = keys / jnp.linalg.norm(keys, axis=-1, keepdims=True)

    head = heads.JigsawHeads(embed)
    params = head.init(jax.random.PRNGKey(0),
                       patch_feats[:2], jnp.tile(jnp.arange(slots), (2, 1)))

    def embed_fn(params, ids, perms):
        e = head.apply(params, patch_feats[ids], perms)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    def gap(params):
        ids = jnp.arange(64)
        p1 = jax.vmap(lambda k: jax.random.permutation(k, slots))(
            jax.random.split(jax.random.PRNGKey(1), 64))
        p2 = jax.vmap(lambda k: jax.random.permutation(k, slots))(
            jax.random.split(jax.random.PRNGKey(2), 64))
        e1, e2 = embed_fn(params, ids, p1), embed_fn(params, ids, p2)
        sim = np.asarray(e1 @ e2.T)
        matched = float(np.mean(np.diag(sim)))
        cross = float((sim.sum() - np.trace(sim)) / (64 * 64 - 64))
        return matched - cross, np.asarray(e1), np.asarray(e2)

    gap0, e1, e2 = gap(params)
    # the perm reaches the output: different perms → materially different
    # untrained embeddings (take_along_axis is live, vince_model.py:166-169)
    assert float(np.mean(np.abs(e1 - e2))) > 1e-3

    @jax.jit
    def train_step(params, opt_state, ids, perms):
        def loss_fn(p):
            q = embed_fn(p, ids, perms)
            logits = q @ keys.T / 0.07  # all 256 identities as the bank
            ce = -jax.nn.log_softmax(logits)[jnp.arange(ids.shape[0]), ids]
            acc = (jnp.argmax(logits, -1) == ids).astype(jnp.float32).mean()
            return jnp.mean(ce), acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(3)
    accs = []
    for i in range(300):
        rng, k1, k2 = jax.random.split(rng, 3)
        ids = jax.random.choice(k1, n_ids, (32,), replace=False)
        perms = jax.vmap(lambda k: jax.random.permutation(k, slots))(
            jax.random.split(k2, 32))
        params, opt_state, loss, acc = train_step(params, opt_state, ids, perms)
        accs.append(float(acc))
    final = float(np.mean(accs[-30:]))
    early = float(np.mean(accs[:30]))
    # chance = 1/256 ≈ 0.004; demand a dominant hit-rate and a real climb
    assert final > 0.5, (early, final, accs[::30])
    assert final > early + 0.2, (early, final, accs[::30])
    # trained direction: the head became perm-invariant AND discriminative
    gap1, _, _ = gap(params)
    assert gap1 > gap0 + 0.3, (gap0, gap1)


@pytest.mark.slow
def test_jigsaw_full_path_trains(cpu_devices):
    """Bounded full-path evidence on the 2×2 mesh: both jigsaw-side step
    variants drive the loss DOWN from its untrained value with finite
    metrics, and the perm input reaches the embedding. (Accuracy-above-
    chance for the full path needs a PIRL-scale horizon — see the module
    docstring for the measured 5-config bound; the mechanism's hard signal
    is test_jigsaw_heads_learn_perm_invariant_nce.)"""
    cfg = _make_cfg()
    mesh = make_mesh(MeshSpec(2, 2))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.01, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
    step_q = make_train_step(cfg, opt, mesh, jigsaw_side="query")
    step_k = make_train_step(cfg, opt, mesh, jigsaw_side="key")

    canvases = _identity_canvases()
    gap_before, (e1, e2) = _perm_invariance_gap(
        cfg, jax.device_get(state.params), canvases)
    # the perm input must actually reach the computation: different perms of
    # the same image give materially different untrained embeddings
    assert float(np.mean(np.abs(e1 - e2))) > 1e-3

    rs = np.random.RandomState(0)
    losses = []
    for i in range(int(os.environ.get("JIG_STEPS", "60"))):
        ids = rs.choice(NUM_IDS, 16, replace=False)
        batch = (
            {
                "data": jnp.asarray(canvases[ids]),
                "queue_data": jnp.asarray(canvases[ids]),
            },
        )
        # reference vince_solver.py:397-403: 50/50 which side is jigsawed
        state, metrics = (step_q if i % 2 else step_k)(
            state, batch, jax.random.PRNGKey(i))
        losses.append(float(jax.device_get(metrics["loss/nce_loss"])))

    assert all(np.isfinite(losses)), losses[::10]
    # optimization moves: the loss must drop well below the untrained value
    # (8.2+ at init; the queue-hardening peak sits below that too)
    assert float(np.mean(losses[-10:])) < losses[0] - 1.0, (
        losses[0], np.mean(losses[-10:]), losses[::10])


@pytest.mark.slow
def test_plain_nce_learns_above_chance(cpu_devices):
    """Same identity-coded task through the PLAIN (non-jigsaw) path: NCE
    accuracy must climb far above the 1/(queue+batch) chance level in a
    bounded CI run — a hard accuracy signal (VERDICT r2 weak #7) on top of
    test_training_learns' soft proxies."""
    cfg = dataclasses.replace(_make_cfg(), jigsaw=False)
    mesh = make_mesh(MeshSpec(2, 2))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.01, momentum=0.9))
    state = shard_state(init_vince_state(jax.random.PRNGKey(0), cfg, opt), mesh)
    step = make_train_step(cfg, opt, mesh)

    canvases = _identity_canvases()
    rs = np.random.RandomState(0)
    accs = []
    for i in range(int(os.environ.get("JIG_STEPS", "100"))):
        ids = rs.choice(NUM_IDS, 16, replace=False)
        batch = (
            {
                "data": jnp.asarray(canvases[ids]),
                "queue_data": jnp.asarray(canvases[ids]),
            },
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        accs.append(float(jax.device_get(metrics["nce_accuracy"])))
    chance = 1.0 / (cfg.queue_size + 16)
    final_acc = float(np.mean(accs[-30:]))
    assert final_acc > max(50 * chance, 0.15), (final_acc, accs[::20])
    assert final_acc > float(np.mean(accs[5:35])) + 0.05, accs[::20]
