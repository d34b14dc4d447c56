"""VINCE pretraining solver — the training engine around the jitted step.

Parity with reference ``solvers/vince_solver.py`` (SURVEY.md §2.3): multi-
dataset training (ImageNet + video simultaneously — one batch per source per
iteration, concatenated; ``:340-370``), persistent prefetching loaders
(``:48-49,372-374``), queue prefill with a repeated batch (``fill_queue_repeat``
``:315-333``), train iteration = both encoder forwards → per-source InfoNCE vs
the queue snapshot → update → enqueue → EMA (``:386-518`` — all inside the
jitted step), validation = val-loader losses (wall-clock capped, ``:549-551``)
plus the CIFAR kNN probe (KDTree, k=11 mode vote, ``:651-693``), resume epoch
derived from the restored iteration (``:287-289``).
"""

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vince_tpu.data import get_dataset
from vince_tpu.data.loader import PersistentDataLoader
from vince_tpu.data.npz_dataset import NPZDataset
from vince_tpu.data.prefetch import BatchPrefetcher, pull_with_kill
from vince_tpu.ops.queue import HostImageRing
from vince_tpu.parallel import multihost
from vince_tpu.parallel.mesh import DATA_AXIS, MeshSpec, make_mesh
from vince_tpu.solvers.base_solver import BaseSolver
from vince_tpu.solvers.vince_step import (
    SourceSpec,
    VinceConfig,
    init_vince_state,
    make_embed_fn,
    make_eval_step,
    make_key_prefill_fn,
    make_panel_fn,
    make_train_step,
    shard_state,
)
from vince_tpu.utils.checkpoint import CheckpointManager
from vince_tpu.utils.meters import AverageMeter, Stopwatch


class VinceSolver(BaseSolver):
    def __init__(self, args, train_logger=None, val_logger=None):
        self.train_loaders: List[Tuple[str, PersistentDataLoader]] = []
        self.val_loaders: List[Tuple[str, PersistentDataLoader]] = []
        self.cifar_dataset: Optional[NPZDataset] = None
        self.image_ring: Optional[HostImageRing] = None
        self._step_rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        self._prefetcher: Optional[BatchPrefetcher] = None
        super().__init__(args, train_logger, val_logger)

    @property
    def model_name(self):
        return "VinceModel"

    # ------------------------------------------------------------------ data
    def _make_dataset(self, name: str, subset: str):
        cls = get_dataset(name)
        kwargs = {}
        if name in ("R2V2Dataset", "GOT10KR2V2Dataset"):
            kwargs["num_images_to_return"] = self.args.num_frames
        if name in ("SyntheticVideoDataset", "SyntheticTextureVideoDataset"):
            kwargs["num_videos"] = getattr(self.args, "synthetic_num_videos", 512)
            kwargs["num_images_to_return"] = self.args.num_frames
        return cls(self.args, subset, **kwargs)

    def setup_dataloader(self):
        args = self.args
        self.sources: List[SourceSpec] = []
        if args.disable_dataloader:
            return
        nf = max(args.num_frames, 1)

        # multi-host: every process runs this same code; each loads only its
        # 1/pc of every global batch (disjoint stride slices of a shared-seed
        # epoch permutation) — the staged global array is their union
        pc = multihost.process_count()
        pid = multihost.process_index()

        def add_source(spec: SourceSpec, dataset_name: str):
            self.sources.append(spec)
            items_per_batch = spec.batch_size // spec.num_frames
            if items_per_batch % pc:
                raise ValueError(
                    f"{spec.name}: {items_per_batch} videos/batch not divisible "
                    f"by {pc} processes — raise --batch-size"
                )
            local_items = items_per_batch // pc
            train_loader = PersistentDataLoader(
                batch_size=local_items,
                num_workers=min(args.num_workers, 16),
                never_ending=True,
                use_processes=getattr(args, "loader_processes", False),
                num_shards=pc,
                shard_id=pid,
            )
            train_loader.set_dataset(self._make_dataset(dataset_name, "train"))
            val_loader = PersistentDataLoader(
                batch_size=local_items,
                num_workers=min(args.num_workers, 8),
                never_ending=True,
                num_shards=pc,
                shard_id=pid,
            )
            val_ds = self._make_dataset(dataset_name, "val")
            val_loader.set_dataset(val_ds)
            # one epoch pass = ceil(per-process share / per-process batch) —
            # identical on every process (collective batch counts must agree)
            self._val_epoch_batches = max(
                getattr(self, "_val_epoch_batches", 0),
                -(-(len(val_ds) // pc) // local_items),
            )
            self.train_loaders.append((spec.name, train_loader))
            self.val_loaders.append((spec.name, val_loader))

        if args.use_imagenet:
            # reference vince_solver.py:66-141 — ImageNet source (CE decoders)
            name = "SyntheticImageDataset" if not args.imagenet_data_path else "ImagenetDataset"
            add_source(
                SourceSpec(
                    "IN", batch_size=args.batch_size, num_frames=nf,
                    transform=args.transform, use_imagenet_ce=True, source_id=0,
                ),
                name,
            )
        if args.use_videos or (args.dataset and not args.use_imagenet):
            dataset_name = args.dataset or "R2V2Dataset"
            add_source(
                SourceSpec(
                    "YT", batch_size=args.batch_size, num_frames=nf,
                    transform=args.transform, source_id=1,
                ),
                dataset_name,
            )
        assert self.sources, "no data sources configured (--use-imagenet / --use-videos / --dataset)"

    def setup_other(self):
        # CIFAR kNN probe data (reference vince_solver.py:236-250)
        path = getattr(self.args, "cifar_data_path", "")
        try:
            self.cifar_dataset = NPZDataset(self.args, path, "train", 10000)
            print(f"CIFAR probe loaded: {len(self.cifar_dataset)} images")
        except (FileNotFoundError, OSError, KeyError, ValueError):
            self.cifar_dataset = None
            print("CIFAR probe data not found; kNN probe disabled")

    # ----------------------------------------------------------------- model
    def setup_model(self):
        args = self.args
        n_dev = len(jax.devices())
        mq = max(getattr(args, "mesh_queue_size", 1), 1)
        # clamp to the devices actually present (GPU-id compat hints may ask
        # for an 8-way mesh on a 1-chip host)
        md = getattr(args, "mesh_data_size", 0) or (n_dev // mq)
        md = max(1, min(md, n_dev // mq))
        if multihost.is_multiprocess():
            # staging maps each process's host rows onto its own devices:
            # process boundaries must align with whole data-axis rows
            pc = multihost.process_count()
            if md % pc:
                raise ValueError(
                    f"--mesh-data-size {md} must be divisible by the {pc} "
                    "processes (each host feeds whole data-axis rows)"
                )
            if jax.local_device_count() % mq:
                raise ValueError(
                    f"local device count {jax.local_device_count()} not "
                    f"divisible by --mesh-queue-size {mq} (a queue-sharded "
                    "data row must not straddle hosts)"
                )
        self.mesh = make_mesh(MeshSpec(data_axis_size=md, queue_axis_size=mq))
        dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        self.cfg = VinceConfig(
            sources=tuple(self.sources),
            backbone=args.backbone,
            embed_size=args.vince_embedding_size,
            image_size=args.input_width,
            queue_size=args.vince_queue_size,
            temperature=args.vince_temperature,
            self_temperature=args.vince_self_temperature,
            momentum=args.vince_momentum,
            inter_batch=args.inter_batch_comparison,
            self_batch=args.self_batch_comparison,
            use_attention=args.use_attention,
            jigsaw=args.jigsaw,
            jigsaw_align_weight=getattr(args, "jigsaw_align_weight", 0.0),
            shuffle_bn=getattr(args, "shuffle_bn", True),
            shuffle_mode=getattr(args, "shuffle_mode", "gather"),
            compute_dtype=dtype,
            data_axis_size=md,
            queue_axis_size=mq,
            # measured neutral at q=65536, wins ≥262144 (docs/PERFORMANCE.md):
            # auto-enable where the streaming kernel pays
            use_fused_infonce=getattr(args, "use_fused_infonce", False)
            or args.vince_queue_size > 65536,
            sync_bn=getattr(args, "sync_bn", False),
            remat=getattr(args, "remat", False),
            stem_kind=getattr(args, "stem_kind", "s2d"),
            bn_fold=getattr(args, "bn_fold", "none"),  # ad-hoc args match the model-class default; the CLI parser supplies "expand"
            norm_kind=getattr(args, "norm_kind", "batchnorm"),
            fold_kernel=getattr(args, "fold_kernel", False),
            dw_kind=getattr(args, "dw_kind", "conv"),
            se_kind=getattr(args, "se_kind", "mul"),
            jitter_order=getattr(args, "jitter_order", "torchvision"),
        )
        if self.cfg.use_fused_infonce and self.cfg.embed_size % 128 != 0:
            # the streaming kernel's lane-width contract — _fwd_impl silently
            # falls back to the materializing XLA path otherwise
            print(
                f"NOTE: fused InfoNCE needs embed_size % 128 == 0 (got "
                f"{self.cfg.embed_size}); using the XLA path (identical "
                f"numerics, materializes the [B, B+K] logits)"
            )
        self.optimizer = self._build_optimizer()
        state = init_vince_state(jax.random.PRNGKey(getattr(args, "seed", 0)), self.cfg, self.optimizer)

        weights_path = getattr(args, "pretrained_weights_path", "")
        if (args.use_imagenet_weights or weights_path) and os.path.exists(weights_path):
            # torchvision/VinceModel checkpoint → backbone init (SURVEY §7)
            from vince_tpu.models.vince_model import split_vince_params
            from vince_tpu.utils.torch_convert import (
                convert_vince_state_dict, load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(weights_path)
            t_params, t_stats = convert_vince_state_dict(sd)
            params = dict(state.params)
            stats = dict(state.batch_stats)
            for k, v in t_params.items():
                if k in params:
                    params[k] = jax.tree_util.tree_map(jnp.asarray, v)
            for k, v in t_stats.items():
                if k in stats:
                    stats[k] = jax.tree_util.tree_map(jnp.asarray, v)
            tracked, _ = split_vince_params(params)
            state = state.replace(
                params=params, batch_stats=stats,
                key_params=jax.tree_util.tree_map(jnp.copy, tracked),
                key_batch_stats=jax.tree_util.tree_map(jnp.copy, stats),
            )
            print(f"Initialized backbone from torch weights: {weights_path}")

        self.ckpt = CheckpointManager(
            args.checkpoint_dir,
            args.long_save_checkpoint_dir,
            max_to_keep=5,
            long_save_frequency=args.long_save_frequency,
        )
        if args.restore:
            template = state
            if multihost.is_multiprocess():
                # multi-controller restore: orbax needs the target shardings
                # so each process reads only its own shards from disk
                from vince_tpu.solvers.vince_step import state_shardings

                template = jax.tree_util.tree_map(
                    lambda x, s: jax.ShapeDtypeStruct(
                        np.shape(x), x.dtype, sharding=s
                    ),
                    state,
                    state_shardings(state, self.mesh),
                )
            restored = self.ckpt.restore(
                template,
                saved_variable_prefix=args.saved_variable_prefix,
                new_variable_prefix=args.new_variable_prefix,
            )
            if restored is not None:
                state = restored
                self.iteration = int(np.asarray(state.step)) * args.batch_size
                self.epoch = self.iteration // (args.iterations_per_epoch * args.batch_size)
                # our checkpoints carry the queue (improvement over the
                # reference, SURVEY §5.4) — don't clobber a restored bank
                self._queue_restored = int(np.asarray(state.queue.total)) > 0
                print(f"Restored step {int(np.asarray(state.step))}; resuming epoch {self.epoch}")

        self.state = shard_state(state, self.mesh)
        self.train_step = make_train_step(self.cfg, self.optimizer, self.mesh)
        if self.cfg.jigsaw:
            if getattr(self.args, "jigsaw_sides", "alternate") == "both":
                # --jigsaw-sides both: one step, jigsaw head on both encoders
                both = make_train_step(self.cfg, self.optimizer, self.mesh, jigsaw_side="both")
                self.train_step_jigsaw_q = self.train_step_jigsaw_k = both
            else:
                self.train_step_jigsaw_q = make_train_step(self.cfg, self.optimizer, self.mesh, jigsaw_side="query")
                self.train_step_jigsaw_k = make_train_step(self.cfg, self.optimizer, self.mesh, jigsaw_side="key")
                if getattr(self.args, "jigsaw_warmup_steps", 0) > 0:
                    # --jigsaw-warmup-steps: both-sides phase before alternation
                    self.train_step_jigsaw_both = make_train_step(
                        self.cfg, self.optimizer, self.mesh, jigsaw_side="both")
        self.eval_step = make_eval_step(self.cfg, self.mesh)
        self.embed_fn = make_embed_fn(self.cfg, self.mesh)
        self.key_embed_fn = make_embed_fn(self.cfg, self.mesh, use_key_encoder=True)
        self.key_prefill_fns = [
            make_key_prefill_fn(self.cfg, self.mesh, i)
            for i in range(len(self.sources))
        ]
        self._prefill_counter = 0
        self.panel_fn = make_panel_fn(self.cfg, self.mesh)
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        # positional mirror of the device queue (one thumbnail per bank row);
        # thumbnail resolution scales down with bank size to hold the ring
        # under a fixed host-memory budget (VINCE_THUMB_RING_MB, default 256)
        # — at q=65536/224² that is 32px thumbs ≈ 200 MB (the reference kept
        # FULL images at that size); at q=1M it degrades to ~9px rather than
        # growing to multi-GB host RSS
        self.image_ring = HostImageRing(self.cfg.queue_size)
        budget = float(os.environ.get("VINCE_THUMB_RING_MB", 256)) * 1e6
        side = max(8.0, np.sqrt(budget / (3 * max(self.cfg.queue_size, 1))))
        canvas = int(self.cfg.image_size / 0.875)
        self._thumb_stride = max(1, int(np.ceil(canvas / side)))
        if getattr(self, "_queue_restored", False):
            self.image_ring.clear(tail=int(np.asarray(self.state.queue.tail)))
        self._np_rng = np.random.RandomState(1234)

        if not self.args.disable_dataloader and not getattr(self, "_queue_restored", False):
            self.fill_queue_repeat()
        if not self.args.disable_dataloader:
            # reference vince_solver.py:290 — prefetch starts once the bank
            # is primed, so the prefill path stages synchronously above
            self.start_prefetch()

    def _build_optimizer(self):
        # reference setup_optimizer: SGD(lr, wd=1e-4, momentum=0.9) :252-265;
        # --optimizer lars is the beyond-reference large-batch (pod) recipe
        from vince_tpu.solvers.vince_step import build_vince_optimizer

        return build_vince_optimizer(
            self.lr_schedule, kind=getattr(self.args, "optimizer", "sgd"))

    def setup_optimizer(self):
        pass  # built in setup_model (the jitted step closes over it)

    # ----------------------------------------------------------------- batch
    def _device_batch(self, host_batches: List[Dict[str, np.ndarray]]):
        """Per-source host dicts → tuple of device dicts sharded on the data axis."""
        out = []
        for spec, hb in zip(self.sources, host_batches):
            d = {
                "data": hb["data"],
                "queue_data": hb["queue_data"],
            }
            if spec.use_imagenet_ce:
                d["labels"] = hb["imagenet_labels"].astype(np.int32)
            out.append(
                # single-process: device_put; multi-host: every process
                # contributes its local rows of the global batch
                {k: multihost.stage(self._batch_sharding, v) for k, v in d.items()}
            )
        return tuple(out)

    def _stage_batch(self, should_stop=None):
        """Pull one host batch per source and move it to the device mesh.

        ``should_stop`` (prefetch thread) is polled between bounded waits so
        shutdown never hangs on a slow loader; already-pulled sources are kept
        across waits (sources are independent streams)."""
        host_batches = []
        for _, loader in self.train_loaders:
            hb = pull_with_kill(loader, should_stop)
            if hb is None:
                return None
            host_batches.append(hb)
        return self._device_batch(host_batches), host_batches

    def start_prefetch(self):
        if not getattr(self.args, "batch_prefetch", True):
            return
        if self._prefetcher is None and self.train_loaders:
            self._prefetcher = BatchPrefetcher(self._stage_batch).start()

    def stop_prefetch(self):
        if self._prefetcher is not None:
            self._prefetcher.stop()
            self._prefetcher = None

    def get_batch(self):
        if self._prefetcher is None:
            return self._stage_batch()
        return self._prefetcher.get()

    # ----------------------------------------------------------------- queue
    def _embed_batch_keys(self, device_batch):
        """Key-encoder embeddings + source tags for one multi-source batch —
        train-mode augmentation + train-mode key forward, so prefilled
        vectors come from the same distribution as training-time enqueued
        keys (reference fill_queue runs the full key model on transformed
        loader batches, vince_solver.py:293-313)."""
        keys, srcs = [], []
        rng = jax.random.fold_in(
            jax.random.PRNGKey(getattr(self.args, "seed", 0) + 1),
            self._prefill_counter,
        )
        self._prefill_counter += 1
        for i, (spec, src_batch) in enumerate(zip(self.sources, device_batch)):
            emb = self.key_prefill_fns[i](self.state, src_batch["queue_data"], rng)
            # data-sharded output: multihost.fetch all-gathers across
            # processes, so every process holds the identical full bank
            e = multihost.fetch(emb)
            keys.append(e)
            srcs.append(np.full((len(e),), spec.source_id, np.int32))
        return np.concatenate(keys, axis=0), np.concatenate(srcs, axis=0)

    def _write_queue(self, bank, sources, tail, total):
        """Host bank (complete + identical on every process — _embed_batch_keys
        all-gathers) → the sharded device queue."""
        queue = self.state.queue
        repl = NamedSharding(self.mesh, P())
        new_queue = queue.replace(
            vectors=multihost.global_from_full_host(
                NamedSharding(self.mesh, P("queue")),
                np.asarray(bank, queue.vectors.dtype),
            ),
            sources=multihost.global_from_full_host(
                NamedSharding(self.mesh, P("queue")), np.asarray(sources, np.int32)
            ),
            tail=multihost.global_from_full_host(repl, np.asarray(tail, np.int32)),
            total=multihost.global_from_full_host(repl, np.asarray(total, np.int32)),
        )
        self.state = self.state.replace(queue=new_queue)

    def _host_thumbs(self, host_batches):
        """Per-key thumbnails + source names, in device enqueue order.

        Thumbnails are materialized copies: a strided view would pin the full
        [B, H, W, 3] host batch alive for as long as the ring holds the row
        (q/B batches ≈ 12 GB at the headline config)."""
        thumbs, names = [], []
        s = self._thumb_stride
        for spec, hb in zip(self.sources, host_batches):
            thumbs.extend(np.ascontiguousarray(hb["queue_data"][:, ::s, ::s]))
            names.extend([spec.name] * len(hb["queue_data"]))
        return thumbs, names

    def fill_queue(self):
        """Prefill the bank from many distinct key batches (reference
        vince_solver.py:293-313; leaves the ring marked full)."""
        k = self.cfg.queue_size
        keys, srcs, n = [], [], 0
        thumbs, names = [], []
        print("Filling queue")
        while n < k:
            device_batch, host_batches = self.get_batch()
            e, s = self._embed_batch_keys(device_batch)
            keys.append(e)
            srcs.append(s)
            if not multihost.is_multiprocess():  # ring unused multi-process
                t, nm = self._host_thumbs(host_batches)
                thumbs.extend(t)
                names.extend(nm)
            n += len(e)
        self._write_queue(
            np.concatenate(keys)[:k], np.concatenate(srcs)[:k], tail=0, total=k
        )
        if not multihost.is_multiprocess():  # ring mirrors panels (see above)
            self.image_ring.fill_repeat(thumbs[:k], names[:k])
        print("Queue filled")

    def fill_queue_repeat(self):
        """Prefill the bank by repeating one key batch (reference
        vince_solver.py:315-333: tail reset to 0, full flag cleared)."""
        device_batch, host_batches = self.get_batch()
        keys, srcs = self._embed_batch_keys(device_batch)
        k = self.cfg.queue_size
        reps = int(np.ceil(k / len(keys)))
        bank = np.tile(keys, (reps, 1))[:k]
        sources = np.tile(srcs, reps)[:k]
        self._write_queue(bank, sources, tail=0, total=0)
        if not multihost.is_multiprocess():
            thumbs, names = self._host_thumbs(host_batches)
            self.image_ring.fill_repeat(thumbs, names)
        print("Queue filled with repeats")

    # ----------------------------------------------------------------- train
    def loss_keys(self):
        keys = ["nce_loss"]
        if self.cfg.self_batch:
            keys.append("nce_loss_self")
        if any(s.use_imagenet_ce for s in self.sources):
            keys += ["imagenet_loss_0", "imagenet_loss_1"]
        return keys

    def metric_keys(self):
        keys = ["nce_accuracy", "softmax_weight", "cosine_sim", "cosine_sim_neg_max"]
        if self.cfg.self_batch:
            keys.append("nce_accuracy_self")
        if any(s.use_imagenet_ce for s in self.sources):
            keys += ["imagenet_accuracy_0", "imagenet_accuracy_1"]
        return keys

    def run_train_iteration(self):
        # jax.profiler trace capture (SURVEY §5.1: phase meters + XLA traces).
        # Gate on the never-resetting global step and a one-shot flag —
        # logger_iteration resets every epoch, which would re-enter
        # start_trace next epoch if an epoch had <9 iterations.
        profile_dir = getattr(self.args, "profile_dir", "")
        if profile_dir and multihost.is_multiprocess() and not multihost.is_primary():
            profile_dir = ""  # one trace writer; concurrent writers collide
        if profile_dir and not getattr(self, "_trace_done", False):
            gstep = int(np.asarray(self.state.step))
            if gstep == 5 and not getattr(self, "_trace_active", False):
                from jax import profiler as _profiler

                _profiler.start_trace(profile_dir)
                self._trace_active = True
            elif gstep >= 8 and getattr(self, "_trace_active", False):
                from jax import profiler as _profiler

                _profiler.stop_trace()
                self._trace_active = False
                self._trace_done = True
                print(f"profiler trace written to {profile_dir}")
        watch = Stopwatch().start()
        # with prefetch on (default) this is the residual wait on the staging
        # queue — the same meaning the reference's data_cache_time has over
        # its prefetch thread (vince_solver.py:388-391)
        device_batch, host_batches = self.get_batch()
        self.time_meters["data_cache_time"].update(watch.lap())

        if self.cfg.jigsaw:
            if self.global_step < getattr(self.args, "jigsaw_warmup_steps", 0):
                if (getattr(self.args, "jigsaw_warmup_mix", False)
                        and self.global_step % 2 == 1):
                    # mixed warmup: plain leg (trains the plain projection)
                    step_fn = self.train_step
                else:
                    step_fn = self.train_step_jigsaw_both
            else:
                # reference vince_solver.py:397-403 — 50/50 which side is jigsawed
                step_fn = (
                    self.train_step_jigsaw_k
                    if self._np_rng.rand() < 0.5
                    else self.train_step_jigsaw_q
                )
        else:
            step_fn = self.train_step
        self.state, metrics = step_fn(self.state, device_batch, self._step_rng)
        # value fetch — the only reliable device sync on this stack
        # (CLAUDE.md); this lap therefore times the whole jitted step
        # (augment + both forwards + backward + update + enqueue + EMA)
        metrics = jax.device_get(metrics)
        self.time_meters["step_time"].update(watch.lap())

        self.log_step_metrics(metrics)
        self.time_meters["metrics_time"].update(watch.lap())

        # host-side image ring: exact parallel thumbnails for every enqueued
        # key, same order/tail arithmetic as the device enqueue (reference
        # storage_queue.py:13-14 stores the images alongside the vectors).
        # Multi-controller runs skip image observability entirely: each host
        # sees only its slice of the batch and panel_fn is a collective no
        # single process may call alone — scalars (pmean'd, identical
        # everywhere) remain the pod-run observability surface.
        if not multihost.is_multiprocess():
            thumbs, names = self._host_thumbs(host_batches)
            for t, nm in zip(thumbs, names):
                self.image_ring.enqueue([t], nm)

            if (
                self.train_logger is not None
                and self.logger_iteration > 0
                and self.logger_iteration % self.args.image_log_frequency == 0
            ):
                self.log_images(host_batches)

        self.iteration += self.args.batch_size
        self.logger_iteration += 1
        # save cadence on the NEVER-resetting global step (reference
        # vince_solver.py:500-501 gates on its monotone iteration counter;
        # logger_iteration resets each epoch, which would silence saves
        # whenever save_frequency >= iterations_per_epoch)
        if self.args.save and self.global_step % self.args.save_frequency == 0:
            self.save(num_to_keep=5)
        self.time_meters["log_save_time"].update(watch.lap())
        self.time_meters["total_time"].update(watch.total())
        return metrics

    def log_images(self, host_batches):
        """Tensorboard image panels (reference get_image_output,
        vince_model.py:351-570): input pair grids (:355-382), top-9 NN panels
        (:384-473), ImageNet prediction grids (:475-520), attention overlays
        (:522-568). Uses the val-path device embeddings of the raw host
        canvases (the reference embeds the augmented batch; panel content is
        equivalent for QA)."""
        import jax.numpy as jnp

        from vince_tpu.visualizations import panels

        queue_vecs = np.asarray(jax.device_get(self.state.queue.vectors))
        for spec, hb in zip(self.sources, host_batches):
            data = hb["data"]
            keys = hb["queue_data"]
            grid = panels.input_pair_grid(data, keys, spec.num_frames)
            self.train_logger.image_summary(
                f"{self.full_name}_inputs/{spec.name}", grid, self.iteration
            )
            q_out = jax.device_get(self.panel_fn(self.state, jnp.asarray(data)))
            k_emb, _ = self.key_embed_fn(self.state, jnp.asarray(keys))
            q = np.asarray(q_out["embeddings"])
            k = np.asarray(jax.device_get(k_emb))
            sims = q @ np.concatenate([k, queue_vecs]).T
            groups_q = np.arange(len(q)) // spec.num_frames
            mask = np.zeros_like(sims, dtype=bool)
            mask[:, : len(k)] = groups_q[:, None] == groups_q[None, :]
            panel = panels.nearest_neighbor_panel(
                data, keys, sims, mask,
                self.image_ring.images, self.image_ring.sources,
                temperature=self.cfg.temperature, data_source=spec.name,
            )
            self.train_logger.image_summary(
                f"{self.full_name}_outputs/{spec.name}", panel, self.iteration
            )
            # supervised-decoder prediction grid (reference :475-520)
            if spec.use_imagenet_ce and "imagenet_logits_0" in q_out and (
                "imagenet_labels" in hb
            ):
                pred = panels.imagenet_prediction_grid(
                    data,
                    np.asarray(q_out["imagenet_logits_0"]),
                    np.asarray(hb["imagenet_labels"], np.int64),
                    rng=self._np_rng,
                )
                self.train_logger.image_summary(
                    f"{self.full_name}_predictions/{spec.name}", pred, self.iteration
                )
            # attention-pool overlays (reference :522-568)
            if "attention_masks" in q_out:
                k_out = jax.device_get(self.panel_fn(self.state, jnp.asarray(keys)))
                att = panels.attention_panel(
                    data, keys,
                    np.asarray(q_out["attention_masks"]),
                    np.asarray(k_out["attention_masks"]),
                    rng=self._np_rng,
                )
                self.train_logger.image_summary(
                    f"{self.full_name}_attention/{spec.name}", att, self.iteration
                )

    # ------------------------------------------------------------------- val
    def run_val(self, max_seconds: float = 300.0, max_batches: Optional[int] = None):
        """Val losses on each val loader: one epoch-sized pass per loader,
        wall-capped at 5 minutes (the reference's loop shape, :549-551 —
        its time check is inverted and never fires; ours works) + CIFAR kNN
        probe (reference :651-693). ``max_batches`` is a test/debug cap."""
        epoch_meters: Dict[str, AverageMeter] = {}
        t_start = time.time()
        n = 0
        cap = getattr(self, "_val_epoch_batches", None) or 1
        if max_batches is not None:
            cap = min(cap, max_batches)
        if multihost.is_multiprocess():
            # eval_step is a collective — every process must run the same
            # batch count, so a per-process wall-clock cap cannot apply
            max_seconds = float("inf")
        while time.time() - t_start < max_seconds and n < cap:
            host_batches = [loader.get_batch() for _, loader in self.val_loaders]
            device_batch = self._device_batch(host_batches)
            # fold the batch index in: eval_local derives randomness from
            # (rng, state.step) and state.step is frozen during val — without
            # this every val batch would reuse identical augmentation
            # parameters and shuffle-BN permutation
            metrics = jax.device_get(self.eval_step(
                self.state, device_batch, jax.random.fold_in(self._step_rng, n)))
            for k, v in metrics.items():
                epoch_meters.setdefault(k, AverageMeter()).update(float(np.asarray(v)))
            n += 1

        self.last_val_batches = n
        results = {k: m.value for k, m in epoch_meters.items()}
        knn_acc = self.run_cifar_knn()
        if knn_acc is not None:
            results["epoch_knn_cifar"] = knn_acc
        if self.val_logger is not None:
            self.val_logger.dict_log(
                {f"epoch/{self.full_name}/{k}": v for k, v in results.items()},
                self.iteration,
            )
        print("val:", {k: round(v, 4) for k, v in results.items()})
        return results

    def run_cifar_knn(self) -> Optional[float]:
        """Embed the probe set, KDTree k=11 (drop self), mode vote —
        reference vince_solver.py:676-684."""
        if self.cifar_dataset is None:
            return None
        if multihost.is_multiprocess():
            # embed_fn's input here is a host-global batch each process would
            # have to hold in full; the probe is a single-host QA tool —
            # run it from a checkpoint instead (tools/extract_embeddings.py)
            if not getattr(self, "_knn_notice_done", False):
                self._knn_notice_done = True
                print("kNN probe skipped under --distributed")
            return None
        from sklearn.neighbors import KDTree
        import scipy.stats

        feats = []
        for chunk, labels, valid in self.cifar_dataset.iter_batches(self.args.batch_size):
            emb, _ = self.embed_fn(self.state, jnp.asarray(chunk))
            feats.append(np.asarray(jax.device_get(emb))[:valid])
        feats = np.concatenate(feats)[: len(self.cifar_dataset)]
        labels = self.cifar_dataset.labels
        kdt = KDTree(feats, leaf_size=40, metric="euclidean")
        neighbors = kdt.query(feats, k=min(11, len(feats)))[1][:, 1:]
        preds = scipy.stats.mode(labels[neighbors], axis=1).mode.reshape(-1)
        acc = float(np.mean(preds == labels))
        print(f"CIFAR kNN accuracy: {acc:.4f}")
        return acc

    # ------------------------------------------------------------------ save
    def save(self, num_to_keep: int = 5):
        if not self.args.save:
            return
        if multihost.is_multiprocess():
            # every process calls save; orbax coordinates, each process
            # writes its own shards (device_get of a cross-process sharded
            # array is impossible — and unnecessary)
            self.ckpt.save(self.global_step, self.state)
        else:
            self.ckpt.save(self.global_step, jax.device_get(self.state))

    def end(self):
        if getattr(self, "_ended", False):
            return
        self._ended = True
        self.stop_prefetch()
        for _, loader in self.train_loaders + self.val_loaders:
            loader.shutdown()
        self.ckpt.close()
