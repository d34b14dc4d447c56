"""End-task training/eval steps — frozen-or-finetuned encoder + decoder.

Functional form of reference ``solvers/end_task_base_solver.py``: forward =
(no-grad when frozen) feature extraction → decoder → loss/metrics → backward →
per-group optimizer step (:199-303). One jitted shard_map'ped function per
task over the data axis of the mesh.

Tasks:
  - "classifier": MultiLinearModel two heads (ImageNet/SUN probes;
    ``end_task_classifier_solver.py:18-28``), per-head LRs ``base_lr·0.01^m``
    for ImageNet (:30-41) via optax.multi_transform.
  - "kinetics": LSTM over [B, T, F] frame features
    (``end_task_kinetics_400_solver.py:36-60``).
  - "tracking": SiamFC xcorr head on exemplar/search *spatial* features
    (``end_task_tracking_solver.py:82-98``).
"""

import dataclasses
from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import PartitionSpec as P

from vince_tpu.models.kinetics_model import Kinetics400Model, kinetics_losses
from vince_tpu.models.linear_model import MultiLinearModel, classifier_losses
from vince_tpu.models.tracking_model import SiamFCTrackingModel, tracking_losses
from vince_tpu.models.vince_model import VinceEncoder
from vince_tpu.ops.augment import augment_batch
from vince_tpu.parallel.mesh import DATA_AXIS
from vince_tpu.utils.transforms import make_config


@dataclasses.dataclass(frozen=True)
class EndTaskConfig:
    task: str  # "classifier" | "kinetics" | "tracking"
    backbone: str = "ResNet18"
    embed_size: int = 64  # must match the pretrain checkpoint
    num_classes: int = 1000
    num_frames: int = 1  # kinetics sequence length
    image_size: int = 224
    transform: str = "BasicImagenetTransform"
    freeze_feature_extractor: bool = True
    use_attention: bool = False
    compute_dtype: Any = jnp.float32
    data_axis_size: int = 1
    lstm_hidden: int = 512
    # per-head LR decades: ImageNet probes use lr·0.01^m (:30-41); SUN equal
    head_lr_scales: Tuple[float, ...] = (1.0, 0.01)
    bn_fold: str = "expand"  # 1×1-dot BN folding (matters for fine-tune mode)
    norm_kind: str = "batchnorm"  # must match the pretrain checkpoint


@flax.struct.dataclass
class EndTaskState:
    step: jax.Array
    encoder_params: Any
    encoder_batch_stats: Any
    decoder_params: Any
    opt_state: Any


def build_models(cfg: EndTaskConfig):
    encoder = VinceEncoder(
        backbone_name=cfg.backbone,
        embed_size=cfg.embed_size,
        use_attention=cfg.use_attention,
        dtype=cfg.compute_dtype,
        bn_fold=cfg.bn_fold,
        norm_kind=cfg.norm_kind,
    )
    if cfg.task == "classifier":
        decoder = MultiLinearModel(cfg.num_classes)
    elif cfg.task == "kinetics":
        decoder = Kinetics400Model(cfg.num_classes, cfg.lstm_hidden)
    elif cfg.task == "tracking":
        decoder = SiamFCTrackingModel()
    else:
        raise ValueError(cfg.task)
    return encoder, decoder


def build_optimizer(cfg: EndTaskConfig, base_lr: float, optimizer_kind: str = "adam",
                    schedule=None):
    """Per-head param-group LRs via multi_transform (reference
    end_task_classifier_solver.py:30-58: ImageNet=SGD momentum, others=Adam
    wd=1e-4; frozen encoder ⇒ wd=0 on heads).

    ``schedule`` (optional ``step -> lr``, already including ``base_lr``)
    applies the epoch decay + warmup inside the jitted optimizer — the
    reference decays every end-task param group per epoch via
    ``base_solver.py:107-129``; per-head scales multiply the decayed value.
    """
    wd = 0.0 if cfg.freeze_feature_extractor else 1e-4

    def make_tx(scale):
        if schedule is not None:
            lr = lambda step, s=scale: schedule(step) * s  # noqa: E731
        else:
            lr = base_lr * scale
        if optimizer_kind == "sgd":
            return optax.chain(optax.add_decayed_weights(wd), optax.sgd(lr, momentum=0.9))
        return optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))

    # The optimizer always acts on {"decoder", "encoder"} so the opt_state
    # pytree (and hence checkpoints) is independent of the freeze flag; a
    # frozen encoder gets set_to_zero (no updates), fine-tune gets its own
    # group at base LR + wd=1e-4 (reference end_task_base_solver.py:83-90).
    enc_tx = optax.set_to_zero() if cfg.freeze_feature_extractor else make_tx(1.0)
    if cfg.task == "classifier":
        def head_label(k):
            return f"head{int(k.split('_')[-1])}" if k.startswith("classifier_") else "head0"

        txs = {f"head{i}": make_tx(s) for i, s in enumerate(cfg.head_lr_scales)}
        txs["encoder"] = enc_tx
        return optax.multi_transform(
            txs,
            lambda params: {
                "decoder": {k: head_label(k) for k in params["decoder"]},
                "encoder": "encoder",
            },
        )
    return optax.multi_transform(
        {"decoder": make_tx(1.0), "encoder": enc_tx},
        lambda params: {"decoder": "decoder", "encoder": "encoder"},
    )


def init_end_task_state(
    rng: jax.Array,
    cfg: EndTaskConfig,
    optimizer,
    encoder_params=None,
    encoder_batch_stats=None,
) -> EndTaskState:
    """Init decoder; encoder params come from a pretrain checkpoint (restored
    by the solver via prefix remapping) or fresh init when absent."""
    encoder, decoder = build_models(cfg)
    e_rng, d_rng = jax.random.split(rng)
    dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), cfg.compute_dtype)
    if encoder_params is None:
        variables = encoder.init({"params": e_rng}, dummy)
        encoder_params = variables["params"]
        encoder_batch_stats = variables.get("batch_stats", {})
    from vince_tpu.models.backbones import get_backbone

    out_ch = get_backbone(cfg.backbone)().output_channels
    if cfg.task == "classifier":
        feat = jnp.zeros((2, out_ch), cfg.compute_dtype)
        dvars = decoder.init({"params": d_rng}, feat)
    elif cfg.task == "kinetics":
        feat = jnp.zeros((2, cfg.num_frames, out_ch), cfg.compute_dtype)
        dvars = decoder.init({"params": d_rng}, feat)
    else:  # tracking: spatial features
        s = cfg.image_size // 8  # dilated backbone stride 8
        zf = jnp.zeros((2, 8, 8, out_ch), cfg.compute_dtype)
        xf = jnp.zeros((2, s, s, out_ch), cfg.compute_dtype)
        dvars = decoder.init({"params": d_rng}, zf, xf)
    decoder_params = dvars["params"]
    opt_target = {"decoder": decoder_params, "encoder": encoder_params}
    return EndTaskState(
        step=jnp.zeros((), jnp.int32),
        encoder_params=encoder_params,
        encoder_batch_stats=encoder_batch_stats,
        decoder_params=decoder_params,
        opt_state=optimizer.init(opt_target),
    )


def _extract(encoder, params, batch_stats, images, train, frozen, spatial=False):
    out, mut = encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=train and not frozen,
        mutable=["batch_stats"],
        method=VinceEncoder.extract_features,
    )
    feats = out["spatial_features"] if spatial else out["extracted_features"]
    if frozen:
        feats = lax.stop_gradient(feats)
    return feats, mut["batch_stats"]


def make_end_task_train_step(
    cfg: EndTaskConfig, optimizer, mesh, train: bool = True, per_sample: bool = False
):
    """(state, batch, rng) → (state', metrics). batch dict (data-sharded):
      classifier: {"data" uint8 [B,H,W,3], "labels" int32 [B]}
      kinetics:   {"data" uint8 [B*T,H,W,3] frame-major, "labels" [B]}
      tracking:   {"exemplar" uint8 [B,hz,wz,3], "search" [B,hx,wx,3],
                   "labels" float [B,hy,wy,1] response maps}

    ``per_sample=True`` (eval only) returns per-sample ``[B]`` metric arrays
    in input row order instead of batch means — the full-epoch val pass
    (reference ``end_task_base_solver.py:305-400``) uses this to weight a
    padded final batch exactly.
    """
    assert not (train and per_sample)
    encoder, decoder = build_models(cfg)
    frozen = cfg.freeze_feature_extractor

    def step_local(state: EndTaskState, batch, rng):
        d_idx = lax.axis_index(DATA_AXIS)
        step_rng = jax.random.fold_in(rng, state.step)
        tcfg = make_config(cfg.transform, cfg.image_size)

        def loss_fn(decoder_params, encoder_params):
            if cfg.task == "tracking":
                # crops already made by SiamFCTransforms on host; normalize only
                from vince_tpu.ops.augment import AugmentConfig, _finalize

                z_img = _finalize(batch["exemplar"].astype(jnp.float32) / 255.0, AugmentConfig())
                x_img = _finalize(batch["search"].astype(jnp.float32) / 255.0, AugmentConfig())
                # chain the BN running stats through BOTH forwards (fine-tune
                # mode): the search-image pass must update them too, or the
                # running stats only ever see 127px exemplar crops while
                # eval-mode inference normalizes 255px search images with them
                zf, stats_z = _extract(
                    encoder, encoder_params, state.encoder_batch_stats,
                    z_img.astype(cfg.compute_dtype), train, frozen, spatial=True,
                )
                xf, new_stats = _extract(
                    encoder, encoder_params, stats_z,
                    x_img.astype(cfg.compute_dtype), train, frozen, spatial=True,
                )
                responses = decoder.apply({"params": decoder_params}, zf, xf)
                out = tracking_losses(responses[..., 0], batch["labels"])
            else:
                # global-row-keyed randomness: the augmentation stream is
                # identical across mesh shapes (see vince_step._augment_sources)
                images = augment_batch(
                    step_rng, batch["data"], tcfg, train=train, dtype=cfg.compute_dtype,
                    group_size=cfg.num_frames if cfg.task == "kinetics" else 1,
                    global_batch=batch["data"].shape[0] * cfg.data_axis_size,
                    row_offset=d_idx * batch["data"].shape[0],
                )
                feats, new_stats = _extract(
                    encoder, encoder_params, state.encoder_batch_stats, images, train, frozen
                )
                if cfg.task == "kinetics":
                    # [B*T, F] → [B, T, F] (end_task_kinetics_400_solver.py:47-60)
                    feats = feats.reshape(-1, cfg.num_frames, feats.shape[-1])
                    logits = decoder.apply({"params": decoder_params}, feats)
                    assert logits.shape[0] == batch["labels"].shape[0], (
                        logits.shape, batch["labels"].shape
                    )
                    out = kinetics_losses(logits, batch["labels"])
                else:
                    logits = decoder.apply({"params": decoder_params}, feats)
                    out = classifier_losses(logits, batch["labels"])
            total = sum(v for k, v in out.items() if k.startswith("loss/"))
            out["loss/total_loss"] = total
            return total, (out, new_stats)

        # one combined-tree path; a frozen encoder sees stop_gradient'd
        # features (zero grads) and a set_to_zero optimizer group
        opt_params = {"decoder": state.decoder_params, "encoder": state.encoder_params}

        def loss_combined(p):
            return loss_fn(p["decoder"], p["encoder"])

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_combined, has_aux=True
        )(opt_params)
        grads = lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, state.opt_state, opt_params)
        new_params = optax.apply_updates(opt_params, updates)
        decoder_params = new_params["decoder"]
        encoder_params = new_params["encoder"]
        encoder_batch_stats = (
            state.encoder_batch_stats if frozen else lax.pmean(new_stats, DATA_AXIS)
        )
        new_state = state.replace(
            step=state.step + 1,
            encoder_params=encoder_params,
            decoder_params=decoder_params,
            opt_state=opt_state,
            encoder_batch_stats=encoder_batch_stats,
        )
        return new_state, lax.pmean(metrics, DATA_AXIS)

    def eval_local(state, batch, rng):
        # loss/metrics only, eval-mode encoder, no updates
        d_idx = lax.axis_index(DATA_AXIS)
        step_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step), d_idx)
        tcfg = make_config(cfg.transform, cfg.image_size)
        if cfg.task == "tracking":
            from vince_tpu.ops.augment import AugmentConfig, _finalize

            z_img = _finalize(batch["exemplar"].astype(jnp.float32) / 255.0, AugmentConfig())
            x_img = _finalize(batch["search"].astype(jnp.float32) / 255.0, AugmentConfig())
            zf, _ = _extract(encoder, state.encoder_params, state.encoder_batch_stats,
                             z_img.astype(cfg.compute_dtype), False, True, spatial=True)
            xf, _ = _extract(encoder, state.encoder_params, state.encoder_batch_stats,
                             x_img.astype(cfg.compute_dtype), False, True, spatial=True)
            responses = decoder.apply({"params": state.decoder_params}, zf, xf)
            out = tracking_losses(responses[..., 0], batch["labels"], reduce=not per_sample)
        else:
            images = augment_batch(step_rng, batch["data"], tcfg, train=False, dtype=cfg.compute_dtype)
            feats, _ = _extract(
                encoder, state.encoder_params, state.encoder_batch_stats, images, False, True
            )
            if cfg.task == "kinetics":
                feats = feats.reshape(-1, cfg.num_frames, feats.shape[-1])
                logits = decoder.apply({"params": state.decoder_params}, feats)
                assert logits.shape[0] == batch["labels"].shape[0], (
                    logits.shape, batch["labels"].shape
                )
                out = kinetics_losses(logits, batch["labels"], reduce=not per_sample)
            else:
                logits = decoder.apply({"params": state.decoder_params}, feats)
                out = classifier_losses(logits, batch["labels"], reduce=not per_sample)
        out["loss/total_loss"] = sum(v for k, v in out.items() if k.startswith("loss/"))
        if per_sample:
            return out  # [B_local] rows; shard_map concatenates in device order
        return lax.pmean(out, DATA_AXIS)

    local = step_local if train else eval_local

    def wrapped(state, batch, rng):
        specs = jax.tree_util.tree_map(lambda _: P(), state)
        batch_specs = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)
        if train:
            out_specs = (specs, P())
        elif per_sample:
            out_specs = P(DATA_AXIS)
        else:
            out_specs = P()
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(specs, batch_specs, P()),
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(state, batch, rng)

    return jax.jit(wrapped, donate_argnums=(0,) if train else ())
