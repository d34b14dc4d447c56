"""CLI argument parser — flag-name parity with reference ``arg_parser.py:38-199``.

Same single-namespace design, same registry-by-name semantics (solver /
dataset / backbone / transform resolved against ``__all__`` lists —
``arg_parser.py:14-35``), same derived checkpoint/tensorboard paths embedding
title/description/timestamp (``:211-221``) and cross-flag invariants
(``:202-209``). The GPU-id remapping (``:223-232``) becomes logical mesh-shape
selection: ``--mesh-data-size`` / ``--mesh-queue-size`` over the available TPU
devices (SURVEY.md §5.6).
"""

import argparse
import multiprocessing
import os

from vince_tpu import constants
from vince_tpu.data import __all__ as dataset_names
from vince_tpu.models.backbones import __all__ as backbone_names
from vince_tpu.utils.transforms import __all__ as transform_names

SOLVER_NAMES = [
    "VinceSolver",
    "EndTaskImagenetSolver",
    "EndTaskSunSceneSolver",
    "EndTaskTrackingSolver",
    "EndTaskKinetics400Solver",
]


def _registry_type(names, kind):
    def check(value):
        if value not in names:
            raise argparse.ArgumentTypeError(
                f"Invalid {kind} {value}; choices: {names}"
            )
        return value

    return check


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Video Noise Contrastive Estimation training args (TPU-native)"
    )
    # Basic args (reference arg_parser.py:42-62)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--title", type=str, required=True)
    parser.add_argument("--description", type=str, required=True)
    parser.add_argument("--num-frames", type=int, default=1)
    parser.add_argument("--test-first", action="store_true")
    parser.add_argument("--saved-variable-prefix", default="", type=str)
    parser.add_argument("--new-variable-prefix", default="", type=str)

    # Path args (:64-68)
    parser.add_argument("--base-logdir", metavar="DIR", default="logs", type=str)
    parser.add_argument("--tensorboard-dir", metavar="DIR", default="tensorboard")
    parser.add_argument("--checkpoint-dir", metavar="DIR")
    parser.add_argument("--long-save-checkpoint-dir", metavar="DIR")

    # Dataset args (:70-73)
    parser.add_argument("--data-path", metavar="DIR")
    parser.add_argument("--dataset", type=_registry_type(dataset_names, "dataset"))
    parser.add_argument(
        "--transform",
        default="StandardVideoTransform",
        type=_registry_type(transform_names, "transform"),
    )

    # Architecture args (:75-89)
    parser.add_argument("--solver", type=_registry_type(SOLVER_NAMES, "solver"))
    parser.add_argument(
        "--backbone", metavar="ARCH", type=_registry_type(backbone_names, "backbone"),
        default="ResNet18",
    )
    parser.add_argument("--end-task-classifier-num-classes", default=0, type=int)
    parser.add_argument("--use-attention", action="store_true")
    parser.add_argument("--jigsaw", action="store_true")
    # Beyond the reference: which encoder(s) get the jigsaw head each step.
    # "alternate" = reference parity (vince_solver.py:397-403, 50/50 per step);
    # "both" = jigsaw head on query AND key — measured to learn identity NCE
    # at short horizons where the alternating scheme stays at chance
    # (docs/jigsaw_both_r4.json 0.35 vs ≤1/batch; STATUS.md jigsaw table).
    parser.add_argument("--jigsaw-sides", default="alternate",
                        choices=("alternate", "both"))
    # Beyond the reference: when synthetic fallbacks are in play (no
    # --data-path), use the NON-color-separable texture family for tracking
    # smoke data (tracking.sequences.TextureSequences) so above-chance
    # results cannot come from color histograms.
    parser.add_argument("--synthetic-texture", action="store_true")
    # Beyond the reference: PIRL-style same-image coupling between the jigsaw
    # head and the plain projection. Alone it unpins the alternating scheme's
    # loss but not its accuracy (docs/jigsaw_align_only_r5.json); the
    # demonstrated remedy is --jigsaw-warmup-steps, to which this term is
    # neutral-to-slightly-positive (docs/jigsaw_alternate_fixed_r5.json).
    # 0.0 = reference parity.
    parser.add_argument("--jigsaw-align-weight", default=0.0, type=float)
    # Beyond the reference: run the first N optimizer steps with the jigsaw
    # head on BOTH sides (the mode that learns) before switching to the
    # reference's 50/50 alternation — co-trains the jigsaw head and encoder
    # into one embedding space so alternation starts aligned instead of
    # chasing a drifting cross-head target (docs/jigsaw_warmup_alt_r5.json).
    parser.add_argument("--jigsaw-warmup-steps", default=0, type=int)
    # During the warmup phase, interleave PLAIN steps 50/50 with the
    # both-sides jigsaw steps so the plain projection head co-trains with
    # the jigsaw head (pure both-sides warmup never trains the plain head —
    # at production scale its random embeddings poison the queue at the
    # handoff and the alternation collapses; docs/jigsaw_production_cli_r5.json).
    parser.add_argument("--jigsaw-warmup-mix", action="store_true")
    parser.add_argument("--freeze-feature-extractor", action="store_true")

    # Loss args (:91-101)
    parser.add_argument("--self-batch-comparison", action="store_true")
    parser.add_argument("--inter-batch-comparison", action="store_true")

    # VINCE args (:103-117)
    parser.add_argument("--vince-queue-size", default=256, type=int)
    parser.add_argument("--vince-embedding-size", default=64, type=int)
    parser.add_argument("--vince-momentum", type=float, default=0.999)
    parser.add_argument("--vince-temperature", type=float, default=0.07)
    parser.add_argument("--vince-self-temperature", type=float, default=0.03)
    parser.add_argument("--no-multi-frame", dest="multi_frame", action="store_false")

    # Training args (:119-179)
    parser.add_argument("--epochs", default=200, type=int)
    parser.add_argument("--lr-decay-type", default="cos", choices=["cos", "step"])
    parser.add_argument("--lr-step-schedule", default=[120, 160], nargs="*", type=int)
    parser.add_argument("-j", "--num-workers", default=min(multiprocessing.cpu_count(), 16), type=int)
    parser.add_argument("-b", "--batch-size", default=256, type=int)
    parser.add_argument("--use-videos", action="store_true")
    parser.add_argument("-e", "--iterations-per-epoch", default=10000, type=int)
    parser.add_argument("--base-lr", default=0.001, type=float)
    # Beyond the reference: pretraining optimizer family. "sgd" = reference
    # parity (vince_solver.py:252-265); "lars" = the large-batch layer-wise
    # adaptive recipe (SimCLR/MoCo-v3) for pod-scale global batches — pair it
    # with the linear-scaling rule (--base-lr ∝ global batch / 256).
    parser.add_argument("--optimizer", default="sgd", choices=("sgd", "lars"))
    parser.add_argument("--input-width", default=224, type=int)
    parser.add_argument("--input-height", default=224, type=int)
    parser.add_argument("--use-imagenet-weights", action="store_true")
    parser.add_argument("--no-warmup", dest="use_warmup", action="store_false")
    parser.add_argument("--log-frequency", default=10, type=int)
    parser.add_argument("--image-log-frequency", default=1000, type=int)
    parser.add_argument("--no-save", dest="save", action="store_false")
    parser.add_argument("--no-restore", dest="restore", action="store_false")
    parser.add_argument("--save-frequency", default=5000, type=int)
    parser.add_argument("--long-save-frequency", default=25, type=int)
    parser.add_argument("--disable-dataloader", action="store_true")
    parser.add_argument(
        "--no-batch-prefetch", dest="batch_prefetch", action="store_false",
        help="stage batches synchronously in the train loop instead of the "
        "background device-staging thread (reference prefetch_batches "
        "parity); mainly for timing methodology / debugging",
    )

    # ImageNet args (:181-185)
    parser.add_argument("--use-imagenet", action="store_true")
    parser.add_argument("--imagenet-data-path", type=str, default="")

    # Video extraction args (:187-197)
    parser.add_argument("--video-sample-rate", default=5, type=int)
    parser.add_argument("--max-video-length", type=int, default=512)
    parser.add_argument("--only-use-shots", action="store_true")
    parser.add_argument("--max-side-size", default=480, type=int)

    # --- TPU-native flags (replace --pytorch-gpu-ids / --feature-extractor-gpu-ids) ---
    parser.add_argument(
        "--mesh-data-size", type=int, default=0,
        help="Data-parallel mesh axis size (0 = all devices).",
    )
    parser.add_argument(
        "--mesh-queue-size", type=int, default=1,
        help="Queue-sharding mesh axis size (negative-set scaling).",
    )
    parser.add_argument(
        "--pytorch-gpu-ids", type=str, default=None,
        help="Compat alias (reference arg_parser.py:131-141). Ignored on TPU "
        "except as a mesh-data-size hint when --mesh-data-size is unset.",
    )
    parser.add_argument(
        "--feature-extractor-gpu-ids", type=str, default=None,
        help="Compat alias: device count here sizes the data-parallel mesh "
        "axis when --mesh-data-size is unset (the DataParallel analog).",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="Multi-host (multi-controller) run: jax.distributed.initialize "
        "before any device use. On TPU pods the coordinator auto-detects; "
        "manual clusters pass the three flags below. Every process runs the "
        "same command; loaders feed each process its slice of the batch.",
    )
    parser.add_argument(
        "--coordinator-address", type=str, default="",
        help="host:port of process 0 (unset = auto-detect, TPU pods only).",
    )
    parser.add_argument("--num-processes", type=int, default=0,
                        help="Total controller processes (0 = auto-detect).")
    parser.add_argument("--process-id", type=int, default=-1,
                        help="This process's id (-1 = auto-detect).")
    parser.add_argument(
        "--compute-dtype", default=None, choices=["float32", "bfloat16"],
        help="Encoder compute dtype (bfloat16 on real TPU; default float32, "
        "or bfloat16 when --use-apex is given).",
    )
    parser.add_argument(
        "--use-apex", action="store_true",
        help="Compat alias for the reference's apex AMP flag (arg_parser.py:120): "
        "selects bfloat16 compute (the TPU mixed-precision analog).",
    )
    parser.add_argument("--no-shuffle-bn", dest="shuffle_bn", action="store_false")
    parser.add_argument(
        "--tracker-slots", type=int, default=8,
        help="OTB/GOT-10k eval: track N sequences in lockstep through one "
        "batched forward (1 = the reference's serial per-sequence loop).",
    )
    parser.add_argument(
        "--shuffle-mode", type=str, default="gather", choices=["gather", "a2a"],
        help="Shuffled-BN key scatter: 'gather' all_gathers the global key "
        "images (d*b rows in per chip); 'a2a' uses a balanced all_to_all "
        "(1/d the traffic; needs per-device batch divisible by the data "
        "axis size).",
    )
    parser.add_argument(
        "--jitter-order", default="torchvision", choices=["torchvision", "fixed"],
        help="ColorJitter semantics: 'torchvision' = per-sample random op "
        "order + exact HSV hue (reference transforms parity); 'fixed' = "
        "b->c->s->hue with YIQ hue rotation (round-1 fast path).",
    )
    parser.add_argument(
        "--loader-processes", action="store_true",
        help="Fork-pool loader workers (true parallel JPEG decode on multi-core "
        "hosts; threads are GIL-bound).",
    )
    parser.add_argument(
        "--stem-kind", default="s2d", choices=["conv7", "s2d"],
        help="ResNet stem: direct 7x7-s2 conv or its space-to-depth "
        "reformulation (bit-compatible params, same math, MXU-friendlier).",
    )
    parser.add_argument(
        "--norm-kind", default="batchnorm", choices=["batchnorm", "groupnorm"],
        help="Backbone normalization. groupnorm sidesteps per-device BN-stat "
        "noise at tiny per-device batches (useful for small-scale learning "
        "diagnostics); batchnorm is the reference behavior.",
    )
    parser.add_argument(
        "--bn-fold", default="expand", choices=["none", "expand", "all"],
        help="Fold BatchNorm into the 1x1 dots using batch statistics derived "
        "from input moments (same math, same param tree; removes the pre-norm "
        "HBM round trip). ResNet: 'expand' folds conv3+downsample, 'all' also "
        "folds the channel-reducing conv1 (measured slower). EfficientNet: "
        "folds the MBConv expand convs + head conv ('all' == 'expand' there). "
        "No-op (with a notice) under --norm-kind groupnorm: only BatchNorm "
        "has batch statistics to fold.",
    )
    parser.add_argument(
        "--fold-kernel", action="store_true",
        help="EXPERIMENTAL: route bn2->relu->conv3 through the Pallas fused "
        "dot+moments kernel at folded bottleneck sites. Measured slower than "
        "XLA's pipelines on v5e (reshape-boundary + backward costs — "
        "docs/PERFORMANCE.md round 2); kept for kernel research.",
    )
    parser.add_argument(
        "--native-decode", action="store_true",
        help="Decode JPEGs through the C++ library (vince_tpu/native): "
        "DCT-domain scaled decode + fused resize, GIL-free so thread workers "
        "parallelize across cores. Falls back to cv2 per-file on non-JPEG or "
        "decode failure, and globally when no g++/libjpeg is available.",
    )
    parser.add_argument(
        "--dw-kind", default="conv", choices=["conv", "tap", "pallas"],
        help="EfficientNet depthwise-conv emission: 'conv' = XLA grouped-conv "
        "op (fastest, default); 'tap' = k^2 shifted elementwise FMAs "
        "(measured 2.4x slower); 'pallas' = VPU kernel at stride-1 sites "
        "(measured 72.5 vs 43.4 ms/step at B0 headline — fusion-boundary "
        "tax; docs/PERFORMANCE.md). Both alternatives kept as documented "
        "negatives. Ignored by ResNet backbones.",
    )
    parser.add_argument(
        "--se-kind", default="mul", choices=["mul", "fold"],
        help="EfficientNet squeeze-excite application: 'mul' = elementwise "
        "gate multiply (default); 'fold' = fold the per-sample gate into the "
        "project conv's weights as one batched dot (Conv1x1SEFold) — the "
        "structured attempt at the SE-pool fusion barrier; see "
        "docs/PERFORMANCE.md for the measured verdict. Ignored by ResNets.",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Rematerialize backbone residual blocks (jax.checkpoint): trades "
        "spare MXU FLOPs for HBM activation traffic; enables larger batches.",
    )
    parser.add_argument(
        "--sync-bn", action="store_true",
        help="Cross-chip synced BN statistics (default: per-device, MoCo-style).",
    )
    parser.add_argument(
        "--pretrained-weights-path", type=str, default="",
        help="Torch ResNet/VinceModel .pt state dict to initialize the backbone "
        "(the TPU realization of --use-imagenet-weights; requires torch).",
    )
    parser.add_argument(
        "--cifar-data-path", type=str,
        default=os.path.join("datasets", "cifar_data", "cifar_{data_subset}.npz"),
        help="NPZ path template for the CIFAR kNN probe (skipped if missing).",
    )
    parser.add_argument("--synthetic-num-videos", type=int, default=512)
    parser.add_argument(
        "--use-fused-infonce", action="store_true",
        help="Force the Pallas streaming queue kernel for InfoNCE scoring. "
        "Auto-enabled for --vince-queue-size > 65536, where it beats the XLA "
        "path (neutral at 65536; +27%% at 1M — docs/PERFORMANCE.md).",
    )
    parser.add_argument(
        "--profile-dir", type=str, default="",
        help="Capture a jax.profiler trace of training iterations into DIR "
        "(the reference's phase timers stay on; this adds XLA-level traces).",
    )
    parser.add_argument(
        "--platform", default=None, choices=[None, "cpu", "tpu", "axon"],
        help="Force a JAX platform (e.g. cpu with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 for mesh debug).",
    )
    return parser


def finalize_args(args) -> argparse.Namespace:
    """Derived values + invariant checks (reference arg_parser.py:199-239)."""
    args.input_size = (args.input_height, args.input_width)
    if args.compute_dtype is None:
        # --use-apex is the reference's AMP flag; an explicit --compute-dtype
        # always wins over it
        args.compute_dtype = "bfloat16" if getattr(args, "use_apex", False) else "float32"
    # GPU-id list → mesh-shape hint (reference arg_parser.py:223-232 analog);
    # the solver clamps to the devices actually present
    gpu_ids = getattr(args, "feature_extractor_gpu_ids", None) or getattr(
        args, "pytorch_gpu_ids", None
    )
    if args.mesh_data_size == 0 and gpu_ids:
        args.mesh_data_size = len(str(gpu_ids).split(","))

    # invariant asserts, reference :202-209 (note: the reference's first assert
    # message has the polarity of its condition flipped; we keep the condition)
    assert (not args.inter_batch_comparison) or (
        args.num_frames % 2 == 0 or args.num_frames == 1
    ), "inter-batch comparison needs an even number of frames (or 1)"
    assert (
        not args.self_batch_comparison
    ) or args.inter_batch_comparison, "self-batch-comparison requires inter-batch-comparison"
    assert args.multi_frame or args.num_frames == 1, "--no-multi-frame needs num_frames == 1"
    # --jigsaw-sides is only consulted when --jigsaw is on; a non-default value
    # without it is almost certainly a mis-typed command (round-4 advisor)
    assert (
        getattr(args, "jigsaw_sides", "alternate") == "alternate" or args.jigsaw
    ), "--jigsaw-sides requires --jigsaw (it is ignored on the plain path)"
    assert (
        getattr(args, "jigsaw_align_weight", 0.0) == 0.0 or args.jigsaw
    ), "--jigsaw-align-weight requires --jigsaw (it is ignored on the plain path)"
    assert getattr(args, "jigsaw_warmup_steps", 0) == 0 or (
        args.jigsaw and getattr(args, "jigsaw_sides", "alternate") == "alternate"
    ), "--jigsaw-warmup-steps requires --jigsaw with --jigsaw-sides alternate"
    assert not getattr(args, "jigsaw_warmup_mix", False) or (
        getattr(args, "jigsaw_warmup_steps", 0) > 0
    ), "--jigsaw-warmup-mix requires --jigsaw-warmup-steps > 0"

    args.tensorboard_dir = os.path.join(
        args.base_logdir, args.title, args.tensorboard_dir,
        constants.TIME_STR + "_" + args.description,
    )
    if args.checkpoint_dir is None:
        args.checkpoint_dir = os.path.join(
            args.base_logdir, args.title, "checkpoints_" + args.description
        )
    if args.long_save_checkpoint_dir is None:
        args.long_save_checkpoint_dir = os.path.join(
            args.base_logdir, args.title, "long_checkpoints",
            constants.TIME_STR + "_" + args.description,
        )

    args.saved_variable_prefix = args.saved_variable_prefix.split(",")
    args.new_variable_prefix = args.new_variable_prefix.split(",")
    return args


def parse_args(argv=None):
    args = build_parser().parse_args(argv)
    args = finalize_args(args)
    print("args")
    print("\n".join(f"{k}: {v}" for k, v in sorted(vars(args).items())))
    print("-" * 80)
    return args
