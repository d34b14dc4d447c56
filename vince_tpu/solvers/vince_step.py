"""The VINCE pretraining step — one pure, jitted, mesh-parallel function.

Functional re-architecture of the reference hot loop (``vince_solver.py:386-518``
— SURVEY.md §3.1): everything the reference does across Python objects
(VinceModel forward, VinceQueueModel no-grad forward with shuffled BN,
per-source InfoNCE vs the StorageQueue snapshot, backward, SGD step, queue
enqueue, EMA update) happens inside a single ``shard_map``-ped XLA program over
a (data, queue) mesh:

  batch uint8 → on-device fused augmentation → key fwd (cross-device
  shuffled-BN) → query fwd → per-source multi-pair InfoNCE against the sharded
  queue (streaming softmax over the queue axis) [+ self-batch NCE + supervised
  ImageNet CE on detached features] → pmean/psum grads → SGD(momentum,wd) →
  EMA → global-key enqueue → new state.

Ordering parity: the loss uses the *pre-insert* queue snapshot; enqueue happens
after the update; EMA after enqueue (``vince_solver.py:497-499``).

Gradient correctness under queue sharding: the per-device loss is scaled by
1/queue_axis_size and gradients are psum'd over the queue axis, so the
psum-transpose of the streaming-softmax combine accumulates per-shard
cotangents back to exactly one logical gradient (see ops/sharded_infonce.py).
"""

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from vince_tpu.models.vince_model import (
    VinceEncoder,
    jigsaw_patchify,
    merge_params,
    random_jigsaw_perms,
    split_vince_params,
)
from vince_tpu.ops.augment import augment_batch
from vince_tpu.ops.ema import ema_update
from vince_tpu.ops.queue import QueueState, enqueue_sharded, init_queue
from vince_tpu.ops.sharded_infonce import sharded_multi_pair_infonce
from vince_tpu.parallel.collectives import (
    cross_device_shuffle,
    cross_device_shuffle_a2a,
    cross_device_unshuffle,
    gather_global_batch,
    make_balanced_shuffle_perm,
    make_shuffle_perm,
)
from vince_tpu.parallel.mesh import DATA_AXIS, QUEUE_AXIS
from vince_tpu.utils.transforms import make_config


@dataclasses.dataclass(frozen=True)
class SourceSpec:
    """One data source in the multi-dataset batch (reference trains ImageNet +
    R2V2 simultaneously, ``vince_solver.py:340-370``)."""

    name: str  # "R2V2", "IN", ... (reference data_source tags)
    batch_size: int  # GLOBAL rows for this source (= num_videos * num_frames)
    num_frames: int = 1
    transform: str = "StandardVideoTransform"
    shared_transform: bool = False  # same aug for query & key (r2v2_dataset.py:81-83)
    use_imagenet_ce: bool = False  # supervised decoders on this source
    source_id: int = 0  # int tag stored in the queue


@dataclasses.dataclass(frozen=True)
class VinceConfig:
    """Static configuration of the pretraining step (hashable)."""

    sources: Tuple[SourceSpec, ...]
    backbone: str = "ResNet18"
    embed_size: int = 64  # --vince-embedding-size
    image_size: int = 224
    queue_size: int = 65536  # --vince-queue-size (GLOBAL)
    temperature: float = 0.07  # --vince-temperature
    self_temperature: float = 0.07  # --vince-self-temperature
    momentum: float = 0.999  # --vince-momentum
    inter_batch: bool = True  # --inter-batch-comparison
    self_batch: bool = False  # --self-batch-comparison
    use_attention: bool = False
    jigsaw: bool = False
    shuffle_bn: bool = True
    # --shuffle-mode: how the shuffled-BN key permutation moves rows across
    # the data axis. "gather" = all_gather the global key images + local
    # slice (d·b rows received per chip); "a2a" = balanced all_to_all
    # ((d-1)/d·b rows — 1/d the interconnect traffic; requires the
    # per-device batch divisible by the data axis size).
    shuffle_mode: str = "gather"
    compute_dtype: Any = jnp.float32  # bfloat16 on real TPU
    data_axis_size: int = 1
    queue_axis_size: int = 1
    use_fused_infonce: bool = False  # Pallas streaming queue kernel
    norm_kind: str = "batchnorm"  # {"batchnorm", "groupnorm"}
    sync_bn: bool = False  # cross-chip BN stats over the data axis (vs MoCo per-device)
    remat: bool = False  # --remat: rematerialize residual blocks
    stem_kind: str = "s2d"  # --stem-kind: space-to-depth stem (same math, faster)
    # --bn-fold: derived-stat BN folding for the 1×1 dots. "expand" (conv3 +
    # downsample) is the measured optimum on v5e (70.7→64.4 ms R50 step);
    # "all" also folds conv1 but its xᵀx is 4× the main dot's FLOPs — slower.
    bn_fold: str = "expand"
    # --fold-kernel: Pallas fused bn2→relu→conv3 at folded bottleneck sites
    fold_kernel: bool = False
    # --dw-kind: EfficientNet depthwise emission ("conv" grouped op | "tap"
    # k² elementwise FMAs — loop fusions that admit BN-stat fusion)
    dw_kind: str = "conv"
    # --se-kind: EfficientNet SE application ("mul" elementwise gate | "fold"
    # gate folded into per-sample project-conv weights — Conv1x1SEFold)
    se_kind: str = "mul"
    # --jitter-order: ColorJitter op-order semantics. "torchvision" = exact
    # per-sample random order + HSV hue (parity default); "fixed" = round-1
    # b→c→s→hue with YIQ hue rotation (cheaper — one fewer image pass set)
    jitter_order: str = "torchvision"
    # Diagnostic control (tools/soak_jigsaw.py --identity-perms): run the full
    # jigsaw path (patchify → per-patch backbone → JigsawHeads) but with the
    # identity permutation — isolates permutation-invariance difficulty from
    # the rest of the jigsaw pipeline. Never used in production configs.
    jigsaw_identity_perms: bool = False
    # --jigsaw-align-weight: PIRL-style cross-head alignment term for the
    # reference's 50/50 alternating jigsaw (vince_model.py:196-210). The
    # round-4 control matrix isolated the alternation blocker to cross-head
    # alignment: the jigsaw head and the plain projection never converge to a
    # shared embedding space when each gets gradients only on alternating
    # steps against a drifting EMA target. With weight w > 0, every
    # alternation step ALSO embeds the query images through the *other*
    # query-side head and adds w·InfoNCE(other_head_emb, global query emb)
    # with the same positive mask — exactly PIRL's f(v_I)↔g(v_{I_t})
    # same-image coupling (Misra & van der Maaten 2019, eq. 5), which the
    # reference's alternation dropped. Costs one extra query forward per
    # step; 0.0 = reference parity (off).
    jigsaw_align_weight: float = 0.0

    @property
    def total_batch(self) -> int:
        return sum(s.batch_size for s in self.sources)

    def local_batch(self, s: SourceSpec) -> int:
        assert s.batch_size % self.data_axis_size == 0, (s, self.data_axis_size)
        b = s.batch_size // self.data_axis_size
        assert b % s.num_frames == 0, "device shards must hold whole videos"
        return b

    @property
    def queue_shard_size(self) -> int:
        assert self.queue_size % self.queue_axis_size == 0
        return self.queue_size // self.queue_axis_size


@flax.struct.dataclass
class VinceState:
    step: jax.Array
    params: Any
    batch_stats: Any
    key_params: Any  # EMA subset (reference vince_parameters())
    key_batch_stats: Any
    opt_state: Any
    queue: QueueState


def build_vince_optimizer(lr_schedule, kind: str = "sgd") -> optax.GradientTransformation:
    """The pretraining optimizer (reference setup_optimizer,
    vince_solver.py:252-265: SGD lr-schedule, wd=1e-4, momentum 0.9). Pass a
    *schedule* (callable), not a float — checkpointed opt_state structure
    depends on it (and on ``kind``), and every producer of VinceState
    checkpoints (solver, converter tools) must agree.

    ``kind="lars"`` (beyond the reference): the layer-wise adaptive-rate
    optimizer used by SimCLR/MoCo-v3 for large-batch contrastive pretraining
    (You et al. 2017) — the pod-scale recipe where the global batch grows with
    the data-axis size and plain SGD destabilizes. Trust-ratio adaptation and
    weight decay are masked to matrix/conv kernels only (ndim > 1); biases and
    BN/GN scale/bias take the plain momentum step — the standard exclusion.
    """
    if kind == "lars":
        def mask(params):
            return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)
        return optax.lars(
            lr_schedule, weight_decay=1e-4, weight_decay_mask=mask,
            trust_ratio_mask=mask, momentum=0.9,
        )
    assert kind == "sgd", f"unknown optimizer kind {kind!r}"
    return optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.sgd(lr_schedule, momentum=0.9),
    )


def build_encoder(cfg: VinceConfig) -> VinceEncoder:
    return VinceEncoder(
        backbone_name=cfg.backbone,
        embed_size=cfg.embed_size,
        use_attention=cfg.use_attention,
        jigsaw=cfg.jigsaw,
        use_imagenet_decoders=any(s.use_imagenet_ce for s in cfg.sources),
        dtype=cfg.compute_dtype,
        norm_kind=cfg.norm_kind,
        remat=cfg.remat,
        stem_kind=cfg.stem_kind,
        bn_fold=cfg.bn_fold,
        fold_kernel=cfg.fold_kernel,
        dw_kind=cfg.dw_kind,
        se_kind=cfg.se_kind,
        bn_axis_name=DATA_AXIS if cfg.sync_bn else None,
    )


def init_vince_state(
    rng: jax.Array, cfg: VinceConfig, optimizer: optax.GradientTransformation
) -> VinceState:
    """Single-process init; shard with ``shard_state`` before stepping."""
    # init runs outside shard_map where no mesh axis is bound: drop sync_bn
    # (it only inserts psums in the train-mode stat path — the variable
    # structure is identical)
    model = build_encoder(dataclasses.replace(cfg, sync_bn=False))
    p_rng, q_rng = jax.random.split(rng)
    dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), cfg.compute_dtype)
    variables = model.init({"params": p_rng}, dummy, method=VinceEncoder.full_init)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tracked, _ = split_vince_params(params)
    queue = init_queue(q_rng, cfg.queue_size, cfg.embed_size)
    return VinceState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        key_params=jax.tree_util.tree_map(jnp.copy, tracked),
        key_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=optimizer.init(params),
        queue=queue,
    )


def state_shardings(state: VinceState, mesh) -> VinceState:
    """Pytree of NamedShardings: queue bank sharded over the queue axis
    (HBM-resident sharded state, BASELINE.json north star), rest replicated."""
    repl = NamedSharding(mesh, P())
    specs = jax.tree_util.tree_map(lambda _: repl, state)
    qspec = NamedSharding(mesh, P(QUEUE_AXIS))
    return specs.replace(
        queue=specs.queue.replace(vectors=qspec, sources=qspec)
    )


def shard_state(state: VinceState, mesh) -> VinceState:
    """Place a host-initialized (or restored) state onto the mesh. Works in
    multi-controller runs too: host leaves are identical across processes
    (same-seed deterministic init), restored global arrays pass through."""
    from vince_tpu.parallel import multihost

    return multihost.place(state_shardings(state, mesh), state)


def _state_pspecs(state: VinceState) -> VinceState:
    specs = jax.tree_util.tree_map(lambda _: P(), state)
    return specs.replace(
        queue=specs.queue.replace(vectors=P(QUEUE_AXIS), sources=P(QUEUE_AXIS))
    )


def _source_masks(cfg: VinceConfig, src: SourceSpec, d_idx):
    """Positive + batch-negative masks for this device's query rows vs the
    source's global keys.

    inter_batch=True  (reference vince_model.py:50-77): positives = keys from
      the same video (block-diag by num_frames); every other batch key is a
      negative (neg mask None → complement).
    inter_batch=False (MoCo path, vince_model.py:227-233): positive = own key
      only; batch keys are NOT negatives (all-False neg mask) — negatives come
      solely from the queue.
    """
    b_local = cfg.local_batch(src)
    b_global = src.batch_size
    local_global_idx = d_idx * b_local + jnp.arange(b_local)
    if cfg.inter_batch:
        q_groups = local_global_idx // src.num_frames
        k_groups = jnp.arange(b_global) // src.num_frames
        pos = q_groups[:, None] == k_groups[None, :]
        return pos, None
    pos = local_global_idx[:, None] == jnp.arange(b_global)[None, :]
    return pos, jnp.zeros_like(pos)


def _augment_sources(cfg: VinceConfig, batch, rng, d_idx, mode: str = "train"):
    """Fused per-source augmentation of query+key frames on device.

    mode="val" mirrors the reference's val loaders: queries take the val path
    (resize/0.875 + center crop); keys of single-frame (image) sources stay
    train-augmented (RepeatedImagenetTransform's "first view val, rest train",
    reference transforms.py:189-197), video keys take the val path too.

    Randomness is keyed by GLOBAL row index (augment_batch global_batch /
    row_offset): sample i's augmentation depends on (rng, source, i) only —
    never on the mesh shape — so training trajectories are identical across
    (data × queue) mesh geometries and elastic resharding mid-run preserves
    the augmentation stream.
    """
    q_imgs, k_imgs = [], []
    for si, src in enumerate(cfg.sources):
        tcfg = make_config(src.transform, cfg.image_size, jitter_order=cfg.jitter_order)
        src_rng = jax.random.fold_in(rng, si)
        q_rng = jax.random.fold_in(src_rng, 0)
        k_rng = q_rng if src.shared_transform else jax.random.fold_in(src_rng, 1)
        q_train = mode == "train"
        k_train = mode == "train" or src.num_frames == 1
        b_local = batch[si]["data"].shape[0]
        off = d_idx * b_local
        q_imgs.append(
            augment_batch(q_rng, batch[si]["data"], tcfg, train=q_train,
                          dtype=cfg.compute_dtype,
                          global_batch=src.batch_size, row_offset=off)
        )
        k_imgs.append(
            augment_batch(k_rng, batch[si]["queue_data"], tcfg, train=k_train,
                          dtype=cfg.compute_dtype,
                          global_batch=src.batch_size, row_offset=off)
        )
    return jnp.concatenate(q_imgs, 0), jnp.concatenate(k_imgs, 0)


def _split_sources(cfg: VinceConfig, x):
    """Per-source slices of a locally-concatenated array — ONE offset
    convention, shared with the key-block/mask layout via _source_offsets."""
    return [x[a:b] for a, b in _source_offsets(cfg)]


def _check_shuffle_mode(cfg: VinceConfig):
    if cfg.shuffle_mode not in ("gather", "a2a"):
        raise ValueError(f"unknown shuffle_mode {cfg.shuffle_mode!r}")
    if cfg.shuffle_bn and cfg.shuffle_mode == "a2a":
        b_local = cfg.total_batch // cfg.data_axis_size
        if b_local % cfg.data_axis_size:
            raise ValueError(
                f"--shuffle-mode a2a needs the per-device batch ({b_local}) "
                f"divisible by the data axis size ({cfg.data_axis_size}); "
                "use --shuffle-mode gather"
            )


def _shuffle_keys(cfg: VinceConfig, rng, k_all, d_size: int):
    """Shuffled-BN scatter of the key images across the data axis. Returns
    (k_in, perm): the shuffled local rows and the composite global
    permutation (device i's rows are x_global[perm][i*b:(i+1)*b]; feed perm
    to cross_device_unshuffle unchanged in either mode)."""
    # pin the compute-dtype materialization so the collective moves bf16 key
    # images, never a pre-convert f32 value XLA might prefer to keep live
    # (the aug pipeline computes in f32 and converts at the end; sinking that
    # convert below the gather would double the ICI bytes)
    k_all = lax.optimization_barrier(k_all)
    b_total = k_all.shape[0] * d_size
    if cfg.shuffle_mode == "a2a":
        perm, sigma, tau = make_balanced_shuffle_perm(rng, b_total, d_size)
        return cross_device_shuffle_a2a(k_all, sigma, tau), perm
    perm = make_shuffle_perm(rng, b_total)
    return cross_device_shuffle(k_all, perm), perm


def make_train_step_fn(
    cfg: VinceConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    jigsaw_side: Optional[str] = None,  # None | "query" | "key" | "both"
):
    """Build the shard_map'ped train step: (state, batch, rng) →
    (state', metrics). ``batch`` is a tuple of per-source dicts with uint8
    ``data`` / ``queue_data`` [B_s, H, W, 3] (+ ``labels`` for CE sources),
    sharded on the data axis."""
    _check_shuffle_mode(cfg)
    model = build_encoder(cfg)
    d_size = cfg.data_axis_size
    mq = cfg.queue_axis_size
    queue_axis = QUEUE_AXIS if mq > 1 else None
    embed_dim = cfg.embed_size

    def encoder_apply(params, batch_stats, images, rng, jigsaw: bool, train=True):
        variables = {"params": params, "batch_stats": batch_stats}
        if jigsaw:
            n = images.shape[0]
            if cfg.jigsaw_identity_perms:  # diagnostic control, see VinceConfig
                perms = jnp.tile(jnp.arange(9, dtype=jnp.int32)[None], (n, 1))
            else:
                perms = random_jigsaw_perms(rng, n)
            patches = jigsaw_patchify(images)
            out, mut = model.apply(
                variables, patches, train=train, jigsaw=True, jigsaw_perm=perms,
                mutable=["batch_stats"],
            )
        else:
            out, mut = model.apply(variables, images, train=train, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def step_local(state: VinceState, batch, rng):
        d_idx = lax.axis_index(DATA_AXIS)
        step_rng = jax.random.fold_in(rng, state.step)

        # ---- 1. fused on-device augmentation --------------------------------
        q_all, k_all = _augment_sources(cfg, batch, jax.random.fold_in(step_rng, 0), d_idx)
        b_local_total = q_all.shape[0]

        # ---- 2. key (momentum) forward, no grad, cross-device shuffled BN ---
        # (reference vince_model.py:597-613 + :137-142 shuffle; SURVEY §5.8)
        if cfg.shuffle_bn:
            k_in, perm = _shuffle_keys(cfg, jax.random.fold_in(step_rng, 1), k_all, d_size)
        else:
            k_in, perm = k_all, None
        k_out, key_batch_stats = encoder_apply(
            state.key_params,
            state.key_batch_stats,
            k_in,
            # fold d_idx: jigsaw perms must be per-sample ACROSS devices
            # (reference vince_model.py:166), not repeated on every shard
            jax.random.fold_in(jax.random.fold_in(step_rng, 2), d_idx),
            jigsaw=(jigsaw_side in ("key", "both")),
        )
        k_emb_local = lax.stop_gradient(k_out["embeddings"].astype(jnp.float32))
        if cfg.shuffle_bn:
            k_global = cross_device_unshuffle(k_emb_local, perm)  # [Bg_tot, D]
        else:
            k_global = gather_global_batch(k_emb_local)
        # per-source global key blocks: gathered layout is [d, b_local_tot, D];
        # k_sources[s][d*b_s + i] is device d's i-th local row of source s,
        # matching the _source_masks global index convention.
        kg = k_global.reshape(d_size, b_local_total, embed_dim)
        k_sources = [
            kg[:, off:end].reshape(-1, embed_dim)
            for off, end in _source_offsets(cfg)
        ]

        queue_snapshot = lax.stop_gradient(state.queue.vectors.astype(jnp.float32))

        # ---- 3. query forward + per-source losses ---------------------------
        def loss_fn(params):
            out, batch_stats = encoder_apply(
                params,
                state.batch_stats,
                q_all,
                jax.random.fold_in(jax.random.fold_in(step_rng, 3), d_idx),
                jigsaw=(jigsaw_side in ("query", "both")),
            )
            q_emb = out["embeddings"].astype(jnp.float32)
            q_sources = _split_sources(cfg, q_emb)
            feat_sources = _split_sources(cfg, out["extracted_features"])

            loss_terms: Dict[str, list] = {}
            metrics: Dict[str, jax.Array] = {}

            def add(key, val):
                loss_terms.setdefault(key, []).append(val)

            for si, src in enumerate(cfg.sources):
                mask, neg_mask = _source_masks(cfg, src, d_idx)
                res = sharded_multi_pair_infonce(
                    q_sources[si], k_sources[si], mask, cfg.temperature,
                    queue_shard=queue_snapshot, queue_axis=queue_axis,
                    batch_neg_mask=neg_mask,
                    use_fused_queue_kernel=cfg.use_fused_infonce,
                )
                add("nce_loss", res["dist"])
                for mk in ("nce_accuracy", "softmax_weight", "cosine_sim", "cosine_sim_neg_max"):
                    metrics.setdefault(mk, []).append(res[mk])

                if cfg.self_batch:
                    # reference vince_model.py:213-222 — q·qᵀ over the global
                    # batch with the same positive structure (diag included)
                    q_self_global = gather_global_batch(q_sources[si]).reshape(-1, embed_dim)
                    self_res = sharded_multi_pair_infonce(
                        q_sources[si], q_self_global, mask, cfg.self_temperature,
                    )  # self-batch requires inter_batch (arg_parser invariant)
                    add("nce_loss_self", self_res["dist"])
                    metrics.setdefault("nce_accuracy_self", []).append(self_res["nce_accuracy"])

                if src.use_imagenet_ce:
                    # reference vince_model.py:201-202,244-248 — decoders on
                    # detached features; CE per decoder (loss :282-288)
                    feats = lax.stop_gradient(feat_sources[si])
                    logits0, logits1 = model.apply(
                        {"params": params}, feats, method=VinceEncoder.imagenet_logits
                    )
                    labels = batch[si]["labels"]
                    for di, logits in enumerate((logits0, logits1)):
                        ce = optax.softmax_cross_entropy_with_integer_labels(
                            logits.astype(jnp.float32), labels
                        ).mean()
                        add(f"imagenet_loss_{di}", ce)
                        acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32).mean()
                        metrics.setdefault(f"imagenet_accuracy_{di}", []).append(acc)

            # PIRL-style cross-head alignment (see VinceConfig.jigsaw_align_weight):
            # embed the same query images through the OTHER query-side head and
            # pull same-sample/same-video pairs together across the two heads.
            if cfg.jigsaw_align_weight > 0 and jigsaw_side in ("query", "key"):
                # second train-mode pass over the same images; its BN-stat
                # mutation is discarded (the main pass already updated stats)
                out_a, _ = encoder_apply(
                    params,
                    state.batch_stats,
                    q_all,
                    jax.random.fold_in(jax.random.fold_in(step_rng, 4), d_idx),
                    jigsaw=(jigsaw_side == "key"),  # the head the main q pass skipped
                )
                a_sources = _split_sources(
                    cfg, out_a["embeddings"].astype(jnp.float32)
                )
                for si, src in enumerate(cfg.sources):
                    mask, _ = _source_masks(cfg, src, d_idx)
                    q_global = gather_global_batch(q_sources[si]).reshape(-1, embed_dim)
                    align = sharded_multi_pair_infonce(
                        a_sources[si], q_global, mask, cfg.temperature,
                    )
                    add("nce_loss_align", cfg.jigsaw_align_weight * align["dist"])
                    metrics.setdefault("nce_accuracy_align", []).append(
                        align["nce_accuracy"]
                    )

            # reference vince_solver.py:430-446 — stack per-source dicts, mean
            # per key, total = sum of keys
            loss_dict = {k: jnp.mean(jnp.stack(v)) for k, v in loss_terms.items()}
            total = sum(loss_dict.values())
            metrics_out = {k: jnp.mean(jnp.stack(v)) for k, v in metrics.items()}
            metrics_out.update({f"loss/{k}": v for k, v in loss_dict.items()})
            metrics_out["loss/total_loss"] = total
            return total / mq, (metrics_out, batch_stats)

        (_, (metrics, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # ---- 4. gradient reduction + SGD step -------------------------------
        grads = lax.pmean(grads, DATA_AXIS)
        if mq > 1:
            grads = lax.psum(grads, QUEUE_AXIS)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # keep replicated BN stats consistent across the data axis (improvement
        # over DataParallel's master-replica-only stats, SURVEY §5.8)
        new_batch_stats = lax.pmean(new_batch_stats, DATA_AXIS)
        key_batch_stats = lax.pmean(key_batch_stats, DATA_AXIS)

        # ---- 5. EMA momentum update (after optimizer, vince_solver.py:499) --
        tracked, _ = split_vince_params(params)
        key_params = ema_update(state.key_params, tracked, cfg.momentum)

        # ---- 6. enqueue global keys per source (vince_solver.py:497) --------
        queue = state.queue
        for si, src in enumerate(cfg.sources):
            queue = enqueue_sharded(
                queue, k_sources[si], src.source_id,
                shard_index=lax.axis_index(QUEUE_AXIS), num_shards=mq,
            )

        metrics = lax.pmean(metrics, DATA_AXIS)
        new_state = VinceState(
            step=state.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            key_params=key_params,
            key_batch_stats=key_batch_stats,
            opt_state=opt_state,
            queue=queue,
        )
        return new_state, metrics

    def wrapped(state, batch, rng):
        specs = _state_pspecs(state)
        batch_specs = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)
        fn = jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(specs, batch_specs, P()),
            out_specs=(specs, P()),
            check_vma=False,
        )
        return fn(state, batch, rng)

    return wrapped


def make_train_step(
    cfg: VinceConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    jigsaw_side: Optional[str] = None,
    compiler_options: Optional[dict] = None,
):
    """Jitted train step; `make_train_step_fn` returns the unjitted callable.

    ``compiler_options`` passes xla_tpu_* overrides straight to the compiler
    (swept in tools/exp_compiler_flags.py; BENCH_XLA_FLAGS in bench.py)."""
    return jax.jit(
        make_train_step_fn(cfg, optimizer, mesh, jigsaw_side),
        donate_argnums=(0,),
        compiler_options=compiler_options,
    )


def _source_offsets(cfg: VinceConfig):
    offs, off = [], 0
    for src in cfg.sources:
        b = cfg.local_batch(src)
        offs.append((off, off + b))
        off += b
    return offs


def make_eval_step(cfg: VinceConfig, mesh):
    """Validation step: same forward/loss path as training (incl. train-mode BN
    — parity with reference run_val, which never switches the model to eval,
    vince_solver.py:520-627) but no gradients, no state mutation. Returns the
    metrics dict only."""
    _check_shuffle_mode(cfg)
    model = build_encoder(cfg)
    d_size = cfg.data_axis_size
    mq = cfg.queue_axis_size
    queue_axis = QUEUE_AXIS if mq > 1 else None
    embed_dim = cfg.embed_size

    def eval_local(state: VinceState, batch, rng):
        d_idx = lax.axis_index(DATA_AXIS)
        step_rng = jax.random.fold_in(rng, state.step)
        q_all, k_all = _augment_sources(
            cfg, batch, jax.random.fold_in(step_rng, 0), d_idx, mode="val"
        )
        b_local_total = q_all.shape[0]

        if cfg.shuffle_bn:
            k_in, perm = _shuffle_keys(cfg, jax.random.fold_in(step_rng, 1), k_all, d_size)
        else:
            k_in, perm = k_all, None
        key_vars = {"params": state.key_params, "batch_stats": state.key_batch_stats}
        k_out, _ = model.apply(key_vars, k_in, train=True, mutable=["batch_stats"])
        k_emb_local = k_out["embeddings"].astype(jnp.float32)
        if cfg.shuffle_bn:
            k_global = cross_device_unshuffle(k_emb_local, perm)
        else:
            k_global = gather_global_batch(k_emb_local)
        kg = k_global.reshape(d_size, b_local_total, embed_dim)
        k_sources = [
            kg[:, off:end].reshape(-1, embed_dim) for off, end in _source_offsets(cfg)
        ]

        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            q_all, train=True, mutable=["batch_stats"],
        )
        q_emb = out["embeddings"].astype(jnp.float32)
        q_sources = _split_sources(cfg, q_emb)
        feat_sources = _split_sources(cfg, out["extracted_features"])

        metrics: Dict[str, list] = {}
        queue_snapshot = state.queue.vectors.astype(jnp.float32)
        for si, src in enumerate(cfg.sources):
            mask, neg_mask = _source_masks(cfg, src, d_idx)
            res = sharded_multi_pair_infonce(
                q_sources[si], k_sources[si], mask, cfg.temperature,
                queue_shard=queue_snapshot, queue_axis=queue_axis,
                batch_neg_mask=neg_mask,
                use_fused_queue_kernel=cfg.use_fused_infonce,
            )
            metrics.setdefault("loss/nce_loss", []).append(res["dist"])
            for mk in ("nce_accuracy", "softmax_weight", "cosine_sim", "cosine_sim_neg_max"):
                metrics.setdefault(mk, []).append(res[mk])
            if cfg.self_batch:
                # same forward/loss path as training: val must report the
                # full objective or train-vs-val totals show a spurious gap
                q_self_global = gather_global_batch(q_sources[si]).reshape(-1, embed_dim)
                self_res = sharded_multi_pair_infonce(
                    q_sources[si], q_self_global, mask, cfg.self_temperature,
                )
                metrics.setdefault("loss/nce_loss_self", []).append(self_res["dist"])
                metrics.setdefault("nce_accuracy_self", []).append(self_res["nce_accuracy"])
            if src.use_imagenet_ce:
                logits0, logits1 = model.apply(
                    {"params": state.params}, feat_sources[si],
                    method=VinceEncoder.imagenet_logits,
                )
                labels = batch[si]["labels"]
                for di, logits in enumerate((logits0, logits1)):
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits.astype(jnp.float32), labels
                    ).mean()
                    metrics.setdefault(f"loss/imagenet_loss_{di}", []).append(ce)
                    acc = (jnp.argmax(logits, -1) == labels).astype(jnp.float32).mean()
                    metrics.setdefault(f"imagenet_accuracy_{di}", []).append(acc)
        out_metrics = {k: jnp.mean(jnp.stack(v)) for k, v in metrics.items()}
        return lax.pmean(out_metrics, DATA_AXIS)

    def wrapped(state, batch, rng):
        specs = _state_pspecs(state)
        batch_specs = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)
        fn = jax.shard_map(
            eval_local,
            mesh=mesh,
            in_specs=(specs, batch_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(state, batch, rng)

    return jax.jit(wrapped)


def make_key_prefill_fn(cfg: VinceConfig, mesh, src_idx: int):
    """Jitted key embedder for queue prefill, matching the distribution of
    training-time enqueued keys: train-mode key augmentation of the source's
    ``queue_data`` + train-mode key-encoder forward (stat mutations
    discarded). The reference prefill runs the full key model on transformed
    loader batches (``vince_solver.py:293-313``) — eval-mode embeddings of
    raw canvases would bias the early-NCE denominators until the ring turns
    over."""
    model = build_encoder(cfg)
    src = cfg.sources[src_idx]
    tcfg = make_config(src.transform, cfg.image_size, jitter_order=cfg.jitter_order)

    def embed_local(params, batch_stats, images, rng):
        d_idx = lax.axis_index(DATA_AXIS)
        k_rng = jax.random.fold_in(rng, src_idx)
        imgs = augment_batch(
            k_rng, images, tcfg, train=True, dtype=cfg.compute_dtype,
            global_batch=images.shape[0] * cfg.data_axis_size,
            row_offset=d_idx * images.shape[0],
        )
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, mutable=["batch_stats"],
        )
        return out["embeddings"].astype(jnp.float32)

    def wrapped(state: VinceState, images, rng):
        _, rest = split_vince_params(state.params)
        params = merge_params(state.key_params, rest)
        fn = jax.shard_map(
            embed_local,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        return fn(params, state.key_batch_stats, images, rng)

    return jax.jit(wrapped)


def make_embed_fn(cfg: VinceConfig, mesh, use_key_encoder: bool = False):
    """Jitted embedding extractor for validation / kNN probes: uint8 images
    [B, H, W, 3] (data-sharded) → (embeddings, features), eval-mode BN."""
    model = build_encoder(cfg)

    def embed_local(params, batch_stats, images):
        imgs = images.astype(jnp.float32) / 255.0
        from vince_tpu.ops.augment import _finalize
        from vince_tpu.ops.augment import AugmentConfig

        imgs = _finalize(imgs, AugmentConfig()).astype(cfg.compute_dtype)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False
        )
        return out["embeddings"].astype(jnp.float32), out["extracted_features"].astype(jnp.float32)

    def wrapped(state: VinceState, images):
        if use_key_encoder:
            _, rest = split_vince_params(state.params)
            params = merge_params(state.key_params, rest)
            batch_stats = state.key_batch_stats
        else:
            params, batch_stats = state.params, state.batch_stats
        fn = jax.shard_map(
            embed_local,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )
        return fn(params, batch_stats, images)

    return jax.jit(wrapped)


def make_panel_fn(cfg: VinceConfig, mesh):
    """Jitted visualization forward for the training-loop image panels: uint8
    images [B, H, W, 3] (data-sharded) → dict with ``embeddings`` and, when
    the heads exist, ``attention_masks`` (--use-attention) and the supervised
    ImageNet decoder logits — everything the reference's ``get_image_output``
    consumes (vince_model.py:475-568)."""
    model = build_encoder(cfg)
    has_decoders = any(s.use_imagenet_ce for s in cfg.sources)

    def panel_local(params, batch_stats, images):
        from vince_tpu.ops.augment import AugmentConfig, _finalize

        imgs = _finalize(images.astype(jnp.float32) / 255.0, AugmentConfig())
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs.astype(cfg.compute_dtype), train=False,
        )
        res = {"embeddings": out["embeddings"].astype(jnp.float32)}
        if "attention_masks" in out:
            res["attention_masks"] = out["attention_masks"].astype(jnp.float32)
        if has_decoders:
            l0, l1 = model.apply(
                {"params": params, "batch_stats": batch_stats},
                out["extracted_features"],
                method=VinceEncoder.imagenet_logits,
            )
            res["imagenet_logits_0"] = l0.astype(jnp.float32)
            res["imagenet_logits_1"] = l1.astype(jnp.float32)
        return res

    def wrapped(state: VinceState, images):
        fn = jax.shard_map(
            panel_local,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        return fn(state.params, state.batch_stats, images)

    return jax.jit(wrapped)
