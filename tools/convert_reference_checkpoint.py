#!/usr/bin/env python
"""Convert a reference PyTorch VINCE checkpoint into a vince-tpu Orbax
checkpoint directory ready for --restore / end-task probing.

    python tools/convert_reference_checkpoint.py \
        --torch-checkpoint /path/to/vince_weights.pt \
        --backbone ResNet18 --embed-size 64 \
        --output-dir logs/vince/checkpoints_r18-b-256-q-65536

The encoder params/batch_stats are replaced by the converted torch weights;
queue/optimizer state are freshly initialized (the reference does not
checkpoint them at all, SURVEY.md §5.4).
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch-checkpoint", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--backbone", default="ResNet18")
    parser.add_argument("--embed-size", type=int, default=64)
    parser.add_argument("--queue-size", type=int, default=65536)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--step", type=int, default=0)
    parser.add_argument(
        "--optimizer", default="sgd", choices=("sgd", "lars"),
        help="must match the --optimizer the restored run will use: the "
        "checkpointed opt_state *structure* depends on it",
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vince_tpu.models.vince_model import split_vince_params
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, build_vince_optimizer, init_vince_state,
    )
    from vince_tpu.utils.checkpoint import CheckpointManager
    from vince_tpu.utils.schedules import vince_lr_schedule
    from vince_tpu.utils.torch_convert import (
        convert_vince_state_dict,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(args.torch_checkpoint)
    t_params, t_stats = convert_vince_state_dict(sd)
    has_decoders = "imagenet_decoder_0" in t_params

    cfg = VinceConfig(
        sources=(
            SourceSpec("IN", batch_size=2, num_frames=1, use_imagenet_ce=True)
            if has_decoders
            else SourceSpec("YT", batch_size=2, num_frames=1),
        ),
        backbone=args.backbone,
        embed_size=args.embed_size,
        image_size=args.image_size,
        queue_size=args.queue_size,
    )
    # MUST mirror VinceSolver._build_optimizer so the checkpointed opt_state
    # tree restores into the solver (schedule hyperparams don't matter for a
    # step-0 conversion; the *structure* does)
    optimizer = build_vince_optimizer(
        vince_lr_schedule(0.03, 200, 5000), kind=args.optimizer
    )
    state = init_vince_state(jax.random.PRNGKey(0), cfg, optimizer)

    params = dict(state.params)
    stats = dict(state.batch_stats)
    loaded = []
    for k, v in t_params.items():
        if k in params:
            params[k] = jax.tree_util.tree_map(jnp.asarray, v)
            loaded.append(k)
    for k, v in t_stats.items():
        if k in stats:
            stats[k] = jax.tree_util.tree_map(jnp.asarray, v)
    tracked, _ = split_vince_params(params)
    state = state.replace(
        step=jnp.asarray(args.step, jnp.int32),
        params=params,
        batch_stats=stats,
        key_params=jax.tree_util.tree_map(jnp.copy, tracked),
        key_batch_stats=jax.tree_util.tree_map(jnp.copy, stats),
    )
    mgr = CheckpointManager(args.output_dir, None, max_to_keep=5)
    mgr.save(args.step, jax.device_get(state))
    mgr.close()
    print(f"converted modules: {loaded}")
    print(f"wrote Orbax checkpoint step {args.step} to {args.output_dir}")


if __name__ == "__main__":
    main()
