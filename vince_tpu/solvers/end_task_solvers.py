"""End-task solvers: ImageNet / SUN-397 linear probes, Kinetics-400 LSTM,
SiamFC tracking.

Parity with reference ``solvers/end_task_base_solver.py`` +
``end_task_classifier_solver.py`` + ``end_task_kinetics_400_solver.py`` +
``end_task_tracking_solver.py`` (SURVEY.md §2.3): frozen-or-finetuned VINCE
encoder restored from pretrain checkpoints, decoder networks per task,
Adam(wd=1e-4) default / SGD-momentum for ImageNet, generic train iteration,
full-val epoch, ``run_eval``. Tracking's ``run_eval`` runs the OTB benchmark
through the TPU tracker (``vince_tpu.tracking.tracker``).
"""

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vince_tpu.data import get_dataset
from vince_tpu.data.loader import PersistentDataLoader
from vince_tpu.data.prefetch import BatchPrefetcher, pull_with_kill
from vince_tpu.parallel import multihost
from vince_tpu.parallel.mesh import DATA_AXIS, MeshSpec, make_mesh
from vince_tpu.solvers.base_solver import BaseSolver
from vince_tpu.solvers.end_task_step import (
    EndTaskConfig,
    build_optimizer,
    init_end_task_state,
    make_end_task_train_step,
)
from vince_tpu.utils.checkpoint import CheckpointManager
from vince_tpu.utils.meters import Stopwatch


class EndTaskBaseSolver(BaseSolver):
    task = "classifier"
    optimizer_kind = "adam"  # reference default Adam(wd=1e-4) :75-77
    head_lr_scales = (1.0, 1.0)
    default_dataset: Optional[str] = None
    default_transform = "BasicImagenetTransform"
    data_source = "IN"

    def __init__(self, args, train_logger=None, val_logger=None):
        self.train_loader: Optional[PersistentDataLoader] = None
        self._step_rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        self._prefetcher: Optional[BatchPrefetcher] = None
        super().__init__(args, train_logger, val_logger)

    @property
    def model_name(self):
        return type(self).__name__[: -len("Solver")] + "Model"

    # ------------------------------------------------------------------ data
    def _make_dataset(self, subset: str):
        name = self.args.dataset or self.default_dataset
        cls = get_dataset(name)
        kwargs = {}
        if name in ("Kinetics400Dataset",):
            kwargs["num_images_to_return"] = self.args.num_frames
        return cls(self.args, subset, **kwargs)

    def setup_dataloader(self):
        if self.args.disable_dataloader:
            return
        items = self.args.batch_size // max(self.args.num_frames, 1)
        pc = multihost.process_count()
        if items % pc:
            raise ValueError(
                f"{items} items/batch not divisible by {pc} processes — "
                "raise --batch-size"
            )
        self.train_loader = PersistentDataLoader(
            batch_size=items // pc, num_workers=min(self.args.num_workers, 16),
            never_ending=True,
            use_processes=getattr(self.args, "loader_processes", False),
            num_shards=pc, shard_id=multihost.process_index(),
        )
        self.train_loader.set_dataset(self._make_dataset("train"))
        # val loaders are one-shot, built per pass (_fresh_val_loader) — a
        # persistent never-ending val loader would prefetch forever unused

    # ----------------------------------------------------------------- model
    def _pretrain_checkpoint_dir(self) -> str:
        # reference setup_feature_extractor (:112-129): pretrain checkpoints
        # live under the same title/description as the VinceSolver run;
        # args.checkpoint_dir defaults to exactly that derivation and honors
        # an explicit --checkpoint-dir (e.g. converted reference weights)
        return self.args.checkpoint_dir or os.path.join(
            self.args.base_logdir, self.args.title, "checkpoints_" + self.args.description
        )

    def _restore_encoder(self):
        """Load encoder params/batch_stats from a VINCE pretrain checkpoint;
        tolerate absence (random features) like --no-restore."""
        if not self.args.restore:
            return None, None
        pdir = self._pretrain_checkpoint_dir()
        raw = None
        try:
            mgr = CheckpointManager(pdir, None, max_to_keep=5)
            step = mgr.latest_step()
            if step is not None:
                raw = mgr.manager.restore(step)
            mgr.close()
        except Exception as e:
            print(f"pretrain restore failed ({type(e).__name__}: {e})")
        if raw is None:
            print(f"No pretrain checkpoint at {pdir}; using random encoder features")
            return None, None
        print(f"Restored pretrain encoder from {pdir}")
        return raw["params"], raw.get("batch_stats", {})

    def make_config(self) -> EndTaskConfig:
        args = self.args
        dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        n_dev = len(jax.devices())
        md = max(1, min(getattr(args, "mesh_data_size", 0) or n_dev, n_dev))
        if multihost.is_multiprocess() and md % multihost.process_count():
            raise ValueError(
                f"--mesh-data-size {md} must be divisible by the "
                f"{multihost.process_count()} processes"
            )
        return EndTaskConfig(
            task=self.task,
            backbone=args.backbone,
            embed_size=args.vince_embedding_size,
            num_classes=args.end_task_classifier_num_classes or 1000,
            num_frames=max(args.num_frames, 1),
            image_size=args.input_width,
            transform=args.transform or self.default_transform,
            freeze_feature_extractor=args.freeze_feature_extractor,
            use_attention=args.use_attention,
            compute_dtype=dtype,
            data_axis_size=md,
            head_lr_scales=self.head_lr_scales,
            bn_fold=getattr(args, "bn_fold", "none"),  # ad-hoc args match the model-class default; the CLI parser supplies "expand"
            norm_kind=getattr(args, "norm_kind", "batchnorm"),
        )

    def setup_model(self):
        args = self.args
        self.cfg = self.make_config()
        self.mesh = make_mesh(MeshSpec(data_axis_size=self.cfg.data_axis_size, queue_axis_size=1))
        # schedule-aware: the reference decays every end-task param group per
        # epoch (base_solver.py:107-129) + runner warmup; same curve here,
        # inside the jitted optimizer
        self.optimizer = build_optimizer(self.cfg, args.base_lr, self.optimizer_kind,
                                         schedule=self.lr_schedule)

        enc_params, enc_stats = self._restore_encoder()
        state = init_end_task_state(
            jax.random.PRNGKey(getattr(args, "seed", 0)), self.cfg, self.optimizer,
            encoder_params=enc_params, encoder_batch_stats=enc_stats,
        )

        # decoder checkpoints under <title>/<SolverModelName> (reference :136-147)
        self.ckpt = CheckpointManager(
            os.path.join(args.base_logdir, args.title, self.model_name,
                         "checkpoints_" + args.description),
            os.path.join(args.base_logdir, args.title, self.model_name, "long_checkpoints"),
            max_to_keep=5,
            long_save_frequency=args.long_save_frequency,
        )
        repl = NamedSharding(self.mesh, P())
        if args.restore:
            template = state
            if multihost.is_multiprocess():
                # multi-controller restore needs target shardings (replicated)
                template = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=repl),
                    state,
                )
            restored = self.ckpt.restore(template)
            if restored is not None:
                state = restored
                self.iteration = int(np.asarray(state.step)) * args.batch_size
                print(f"Restored end-task step {int(np.asarray(state.step))}")

        self.state = multihost.place(
            jax.tree_util.tree_map(lambda _: repl, state), state
        )
        self.train_step = make_end_task_train_step(self.cfg, self.optimizer, self.mesh, train=True)
        self.metric_step = make_end_task_train_step(
            self.cfg, self.optimizer, self.mesh, train=False, per_sample=True
        )
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))

    def setup_optimizer(self):
        pass  # built in setup_model

    # ----------------------------------------------------------------- batch
    def convert_batch(self, host_batch: Dict[str, np.ndarray]) -> Dict:
        """Host collated dict → device dict (per-task key mapping; reference
        convert_batch overrides)."""
        data = host_batch["data"]
        labels = host_batch.get("classifier_labels", host_batch.get("labels"))
        if self.task == "kinetics":
            # labels arrive one-per-clip from the collate; data is frame-major
            assert labels.shape[0] * self.cfg.num_frames == data.shape[0], (
                labels.shape, data.shape, self.cfg.num_frames
            )
        batch = {"data": data, "labels": labels.astype(np.int32)}
        return {k: multihost.stage(self._batch_sharding, v) for k, v in batch.items()}

    def loss_keys(self):
        if self.task == "classifier":
            return ["classifier_loss_0", "classifier_loss_1"]
        if self.task == "kinetics":
            return ["classifier_loss_0"]
        return ["siam_tracking_loss"]

    def metric_keys(self):
        if self.task == "classifier":
            return ["classifier_accuracy_0", "classifier_accuracy_1"]
        if self.task == "kinetics":
            return ["classifier_accuracy_0"]
        return ["dist", "center_dist", "mean_iou"]

    # ----------------------------------------------------------------- train
    def _stage_train_batch(self, should_stop=None):
        hb = pull_with_kill(self.train_loader, should_stop)
        return None if hb is None else self.convert_batch(hb)

    def run_train_iteration(self):
        watch = Stopwatch().start()
        # lazy prefetch start: eval-only runs (run_end_task_eval.py) never
        # stage train batches; same staging overlap as VinceSolver otherwise
        if (self._prefetcher is None and getattr(self.args, "batch_prefetch", True)
                and self.train_loader is not None):
            self._prefetcher = BatchPrefetcher(self._stage_train_batch).start()
        batch = (self._prefetcher.get() if self._prefetcher is not None
                 else self._stage_train_batch())
        self.time_meters["data_cache_time"].update(watch.lap())
        self.state, metrics = self.train_step(self.state, batch, self._step_rng)
        # value fetch = the reliable device sync (CLAUDE.md); this lap times
        # the whole jitted step
        metrics = jax.device_get(metrics)
        self.time_meters["step_time"].update(watch.lap())
        self.log_step_metrics(metrics)
        self.time_meters["metrics_time"].update(watch.lap())
        self.iteration += self.args.batch_size
        self.logger_iteration += 1
        # cadence on the never-resetting global step (see VinceSolver note)
        if self.args.save and self.global_step % self.args.save_frequency == 0:
            self.save()
        self.time_meters["log_save_time"].update(watch.lap())
        self.time_meters["total_time"].update(watch.total())
        return metrics

    def _items_per_batch(self) -> int:
        return self.args.batch_size // max(self.args.num_frames, 1)

    def _fresh_val_loader(self):
        """A one-shot (non-cycling, unshuffled) loader over a freshly built
        val dataset — the reference's rebuilt val dataloader
        (``end_task_base_solver.py:402-417``). Multi-host: each process reads
        a disjoint stride slice; ``run_val`` keeps collective batch counts
        equal with zero-weight filler batches."""
        ds = self._make_dataset("val")
        pc = multihost.process_count()
        loader = PersistentDataLoader(
            batch_size=self._items_per_batch() // pc,
            num_workers=min(self.args.num_workers, 8),
            shuffle=False,
            never_ending=False,
            num_shards=pc,
            shard_id=multihost.process_index(),
        )
        loader.set_dataset(ds)
        return ds, loader

    @staticmethod
    def _pad_host_batch(hb: Dict[str, np.ndarray], target_items: int, n_items: int):
        """Pad a partial final batch to the static batch shape by cycling its
        items (padded rows are excluded from aggregation via valid counts)."""
        if n_items == target_items:
            return hb
        idx = np.arange(target_items) % n_items
        out = {}
        for k, v in hb.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] % n_items == 0:
                rows = v.shape[0] // n_items
                vi = v.reshape((n_items, rows) + v.shape[1:])
                out[k] = vi[idx].reshape((target_items * rows,) + v.shape[1:])
            else:
                out[k] = v
        return out

    def run_val(self, max_batches: Optional[int] = None, loader=None, dataset=None):
        """One complete pass over the val set (reference
        ``end_task_base_solver.py:305-400``): epoch-sized —
        ``ceil(len(val)/items_per_batch)`` batches — with the final partial
        batch padded to the static shape and aggregated by exact per-sample
        weighting (``metric_step`` returns per-sample arrays)."""
        own_loader = loader is None
        if own_loader:
            dataset, loader = self._fresh_val_loader()
        pc = multihost.process_count()
        items = self._items_per_batch() // pc  # per-process items per batch
        label_keys = ("classifier_labels", "labels", "imagenet_labels")
        sums: Dict[str, float] = {}
        n_samples = 0
        n_batches = 0
        # multi-host: metric_step is a collective, so every process must run
        # the same batch count even though shard sizes differ by ±1 — when a
        # process's slice runs dry it re-runs its last batch with zero weight
        expected = None
        if dataset is not None:
            expected = int(np.ceil(np.ceil(len(dataset) / pc) / items))
        if pc > 1:
            # collective-count preconditions: without them a short/absent
            # shard breaks out of the loop while peers wait forever
            if dataset is None:
                raise ValueError(
                    "multi-process run_val needs `dataset` to derive the "
                    "collective batch count"
                )
            if len(dataset) < pc:
                raise ValueError(
                    f"val set ({len(dataset)} items) smaller than "
                    f"{pc} processes"
                )
        last_hb = None
        try:
            it = iter(loader)
            while True:
                if max_batches is not None and n_batches >= max_batches:
                    break
                if expected is not None and n_batches >= expected:
                    break
                try:
                    hb = next(it)
                    label_key = next((k for k in label_keys if k in hb), None)
                    if label_key is None:
                        raise ValueError(
                            f"val batch has none of the label keys {label_keys}: "
                            f"{sorted(hb)}"
                        )
                    n_items = len(hb[label_key])
                    hb = self._pad_host_batch(hb, items, n_items)
                    last_hb = hb
                except StopIteration:
                    if pc == 1 or expected is None or last_hb is None:
                        break
                    hb, n_items = last_hb, 0  # collective filler, zero weight
                batch = self.convert_batch(hb)
                per = self.metric_step(self.state, batch, self._step_rng)
                for k, v in per.items():
                    # local_view: this process's rows (= whole batch when pc=1)
                    sums[k] = sums.get(k, 0.0) + float(
                        multihost.local_view(v)[:n_items].sum()
                    )
                n_samples += n_items
                n_batches += 1
        finally:
            if own_loader:
                loader.shutdown()
        if pc > 1:
            keys = sorted(sums)
            totals = multihost.host_allsum([sums[k] for k in keys] + [n_samples])
            sums = dict(zip(keys, totals[:-1]))
            n_samples = int(totals[-1])
        if dataset is not None and max_batches is None:
            # sample-based (filler batches make the batch count always equal
            # under pc>1, so count every item instead): e.g. a chunk of
            # unreadable files made the loader drop items — report, don't
            # abort training mid-epoch (the exact-count contract is pinned
            # by tests, not production)
            if n_samples != len(dataset) or n_batches != expected:
                print(
                    f"WARNING: val pass covered {n_samples} samples in "
                    f"{n_batches} batches, expected {len(dataset)} in "
                    f"{expected} — some val items were unreadable?"
                )
        self.last_val_batches = n_batches
        self.last_val_samples = n_samples
        results = {k: s / max(n_samples, 1) for k, s in sums.items()}
        if self.val_logger is not None:
            self.val_logger.dict_log(
                {f"epoch/{self.full_name}/{k}": v for k, v in results.items()}, self.iteration
            )
        print(f"val ({n_samples} samples, {n_batches} batches):",
              {k: round(v, 4) for k, v in results.items()})
        return results

    def run_eval(self):
        """Rebuild the val loader and run one complete val pass (reference
        ``end_task_base_solver.py:402-417``)."""
        dataset, loader = self._fresh_val_loader()
        try:
            return self.run_val(loader=loader, dataset=dataset)
        finally:
            loader.shutdown()

    def save(self, num_to_keep: int = 5):
        if self.args.save:
            state = (self.state if multihost.is_multiprocess()
                     else jax.device_get(self.state))
            self.ckpt.save(self.global_step, state)

    def end(self):
        if getattr(self, "_ended", False):
            return
        self._ended = True
        if self._prefetcher is not None:
            self._prefetcher.stop()
            self._prefetcher = None
        # val loaders are one-shot: run_val/_fresh_val_loader own and shut
        # them down per pass
        if self.train_loader is not None:
            self.train_loader.shutdown()
        self.ckpt.close()


class EndTaskImagenetSolver(EndTaskBaseSolver):
    """Linear probe on ImageNet: SGD momentum, per-head LR base·0.01^m
    (reference end_task_classifier_solver.py:43-63)."""

    task = "classifier"
    optimizer_kind = "sgd"
    head_lr_scales = (1.0, 0.01)
    default_dataset = "ImagenetDataset"
    data_source = "IN"


class EndTaskSunSceneSolver(EndTaskBaseSolver):
    """SUN-397 probe: Adam, equal head LRs (reference :66-92)."""

    task = "classifier"
    optimizer_kind = "adam"
    head_lr_scales = (1.0, 1.0)
    default_dataset = "SunSceneDataset"
    default_transform = "SunSceneTransform"
    data_source = "SUN_Scenes"


class EndTaskKinetics400Solver(EndTaskBaseSolver):
    """Kinetics-400 LSTM over frame features (reference
    end_task_kinetics_400_solver.py)."""

    task = "kinetics"
    optimizer_kind = "adam"
    default_dataset = "Kinetics400Dataset"
    default_transform = "Kinetics400Transform"
    data_source = "Kinetics400"


class EndTaskTrackingSolver(EndTaskBaseSolver):
    """SiamFC tracking on GOT-10k pairs; run_eval = OTB benchmark (reference
    end_task_tracking_solver.py:100-116)."""

    task = "tracking"
    optimizer_kind = "sgd"
    default_dataset = "GOT10kDataset"
    default_transform = "GOT10KTransform"
    data_source = "GOT10k"

    def make_config(self) -> EndTaskConfig:
        cfg = super().make_config()
        # Dense stride-8 features need the dilated backbone (reference
        # end_tasks/train_tracking.sh uses ResNet18SiamFCDilated; the label
        # maps in init_end_task_state assume image_size//8 response grids).
        # Map a plain ResNet to its dilated variant rather than training
        # against mis-sized labels; pretrain weights load either way (same
        # param tree, dilation is a conv attribute).
        if not cfg.backbone.endswith("SiamFCDilated"):
            dilated = cfg.backbone + "SiamFCDilated"
            from vince_tpu.models import backbones

            if dilated not in backbones.__all__:
                raise ValueError(
                    f"tracking needs a stride-8 dilated backbone; no dilated "
                    f"variant of {cfg.backbone!r} exists (use "
                    f"ResNet18SiamFCDilated / ResNet50SiamFCDilated)"
                )
            print(f"tracking: using {dilated} (dense stride-8 features) "
                  f"for --backbone {cfg.backbone}")
            cfg = dataclasses.replace(cfg, backbone=dilated)
        return cfg

    def convert_batch(self, host_batch):
        batch = {
            "exemplar": host_batch["exemplar"],
            "search": host_batch["search"],
            "labels": host_batch["labels"].astype(np.float32),  # [B, hy, wy]
        }
        return {k: multihost.stage(self._batch_sharding, v) for k, v in batch.items()}

    def run_eval(self):
        from vince_tpu.tracking.experiments import ExperimentOTB
        from vince_tpu.tracking.tracker import BatchedTrackerSiamFC, TrackerSiamFC

        # the tracker is a host-driven per-frame loop on plain local jit —
        # a single-controller tool: process 0 runs it on a localized copy of
        # the (replicated) state, everyone else waits at the barrier
        state = self.state
        if multihost.is_multiprocess():
            if not multihost.is_primary():
                multihost.sync("otb_eval")
                return {}
            state = jax.device_get(self.state)
        n_slots = getattr(self.args, "tracker_slots", 8)
        tracker_cls = BatchedTrackerSiamFC if n_slots > 1 else TrackerSiamFC
        kwargs = {"n_slots": n_slots} if n_slots > 1 else {}
        tracker = tracker_cls(
            name=f"SiamFC_{self.model_name}_{self.args.description}",
            cfg=None,  # defaults (TRACKER_CFG)
            encoder_cfg=self.cfg,
            state=state,
            **kwargs,
        )
        root = os.path.join(self.args.data_path, "otb100") if self.args.data_path else None
        experiment = ExperimentOTB(
            root, texture=getattr(self.args, "synthetic_texture", False)
        )
        results = experiment.run(tracker)
        if results.get("synthetic"):
            print("OTB results (SYNTHETIC smoke fallback — not a real OTB "
                  "score):", results)
        else:
            print("OTB results:", results)
        if self.val_logger is not None:
            self.val_logger.dict_log(
                {f"epoch/{self.full_name}/otb_{k}": float(v)
                 for k, v in results.items()},
                self.iteration,
            )
        if multihost.is_multiprocess():
            multihost.sync("otb_eval")
        return results
