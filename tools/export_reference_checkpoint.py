#!/usr/bin/env python
"""Export a vince-tpu Orbax checkpoint back to the reference's PyTorch
format (the inverse of tools/convert_reference_checkpoint.py):

    python tools/export_reference_checkpoint.py \
        --checkpoint-dir logs/vince/checkpoints_<desc> \
        --output /path/to/vince_weights.pt

The query encoder's params + batch stats become a ``VinceModel`` state dict
(``feature_extractor.module.model.*`` / ``embedding.*`` /
``imagenet_decoders.*`` — reference ``models/vince_model.py:26-90`` naming)
loadable by the reference's ``pt_util.restore`` or any torch MoCo-style
consumer. ``--encoder key`` exports the momentum (key) encoder instead.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--encoder", default="query", choices=["query", "key"],
                        help="query = trained encoder; key = EMA momentum encoder")
    args = parser.parse_args(argv)

    from vince_tpu.utils.checkpoint import CheckpointManager
    from vince_tpu.utils.torch_export import export_vince_state_dict

    mgr = CheckpointManager(args.checkpoint_dir, None)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    raw = mgr.restore_raw(step)
    mgr.close()
    if args.encoder == "key":
        params = raw["key_params"]
        stats = raw.get("key_batch_stats", {})
        # the key tree only tracks EMA'd modules; heads absent is fine
    else:
        params = raw["params"]
        stats = raw.get("batch_stats", {})
    sd = export_vince_state_dict(params, stats)

    import torch

    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.output)
    print(f"exported step {step} ({args.encoder} encoder): "
          f"{len(sd)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
