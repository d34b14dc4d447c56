#!/usr/bin/env python
"""AOT-compile the PRODUCTION VINCE train step for multi-chip meshes and audit
the optimized HLO's collective structure.

The TPU-first design's core claim is that one shard_map program scales over a
(data × queue) mesh with exactly the collectives the algorithm needs
(SURVEY.md §2.10/§5.8) and nothing else:

  - key-image movement for shuffled-BN over ``data`` (one all-gather in
    'gather' mode / one all-to-all in 'a2a' mode),
  - the key-embedding unshuffle all-gather over ``data`` (MoCo-DDP
    ``concat_all_gather``, reference ``vince_model.py:35``),
  - the streaming-softmax psum pair over ``queue``
    (ops/sharded_infonce.py),
  - gradient + BN-stat + metric reductions over ``data`` (+ the grad psum
    over ``queue``) — XLA's all-reduce combiner may merge these freely,
  - and critically NO all-gather of the queue bank itself (no collective
    result anywhere near queue_shard_size × D bytes) and no accidental
    resharding copies.

This lowers + compiles the full production geometry — ResNet50, b=128/chip
@224², q=65536, bf16, bn_fold=expand, fused aug, shuffled BN — for 8×1, 4×2
and 2×4 meshes on the virtual CPU platform (no pod needed: the SPMD
partitioner runs identically), then parses the optimized HLO.

CPU-backend caveat: XLA:CPU float normalization upcasts bf16 compute to f32,
so byte volumes printed for bf16 payloads are a 2× upper bound of the TPU
numbers (e.g. the 8×1 key-image gather prints 617 MB f32 = 308 MB bf16 on
chip). The collective STRUCTURE — op kinds, counts, mesh axes, which tensors
move — is what this audit validates, and that transfers verbatim.

Usage: python tools/audit_collectives.py [--quick] [--json OUT.json]
"""

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must precede jax import; the sandbox sitecustomize overrides JAX_PLATFORMS
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-gather|all-reduce|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\(",
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string like 'bf16[128,224,224,3]' or a
    tuple '(f32[16,128], f32[16,128])'."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _axis_of_groups(groups, md: int, mq: int) -> str:
    """Map an HLO replica_groups list to a mesh axis. Device i sits at
    (data=i//mq, queue=i%mq) — queue groups are consecutive runs of mq,
    data groups are stride-mq combs."""
    if not groups:
        return "all"
    g0 = groups[0]
    n = md * mq
    if len(g0) == n:
        # a degenerate axis spans all devices — name the real one
        if mq == 1:
            return "data"
        if md == 1:
            return "queue"
        return "all"
    if len(g0) == mq and all(g[-1] - g[0] == mq - 1 for g in groups):
        return "queue"
    if len(g0) == md and all(
        all(g[k + 1] - g[k] == mq for k in range(len(g) - 1)) for g in groups
    ):
        return "data"
    return f"other{sorted(map(len, groups))}"


def parse_collectives(hlo_text: str, md: int, mq: int):
    """Aggregate collective ops in optimized HLO by (op, axis, bytes)."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.match(line)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        groups = [
            [int(x) for x in g.split(",") if x]
            for g in re.findall(r"\{([\d,]*)\}", line.split("replica_groups=")[-1])
        ] if "replica_groups=" in line else []
        # strip the outer {{...}} wrapper artifacts
        groups = [g for g in groups if g]
        out.append({
            "op": op,
            "axis": _axis_of_groups(groups, md, mq),
            "bytes": _shape_bytes(shape_str),
            "shape": shape_str,
        })
    return out


def audit(md: int, mq: int, batch_per_chip: int, image: int, queue_size: int,
          backbone: str, shuffle_mode: str):
    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step,
        state_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vince_tpu.parallel.mesh import DATA_AXIS

    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=batch_per_chip * md, num_frames=4,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=backbone, embed_size=128, image_size=image,
        queue_size=queue_size, compute_dtype=jnp.bfloat16,
        data_axis_size=md, queue_axis_size=mq,
        shuffle_bn=True, shuffle_mode=shuffle_mode,
        bn_fold="expand", stem_kind="s2d",
    )
    mesh = make_mesh(MeshSpec(md, mq))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.sgd(0.03, momentum=0.9))

    state_shapes = jax.eval_shape(
        lambda r: init_vince_state(r, cfg, optimizer), jax.random.PRNGKey(0)
    )
    sh = state_shardings(state_shapes, mesh)
    state_sds = jax.tree_util.tree_map(
        lambda s, sched: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sched),
        state_shapes, sh,
    )
    canvas = int(image / 0.875)
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch_sds = (
        {
            "data": jax.ShapeDtypeStruct((batch_per_chip * md, canvas, canvas, 3),
                                         jnp.uint8, sharding=bsh),
            "queue_data": jax.ShapeDtypeStruct((batch_per_chip * md, canvas, canvas, 3),
                                               jnp.uint8, sharding=bsh),
        },
    )
    rng_sd = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = make_train_step(cfg, optimizer, mesh)
    import time
    t0 = time.time()
    lowered = step.lower(state_sds, batch_sds, rng_sd)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    hlo = compiled.as_text()
    colls = parse_collectives(hlo, md, mq)
    return cfg, colls, hlo, t_lower, t_compile


def analytic_table(cfg, optimizer, batch_per_chip: int):
    """SCALING.md's collective cost model as numbers (VERDICT r4 item 6):
    what each collective in the compiled step MUST move, derived from config
    shapes only — so HLO drift (an accidental reshard, a widened gather, a
    dropped fusion) fails mechanically instead of needing a human to re-read
    the audit printout.

    All byte figures use the element size the CPU HLO actually carries
    (f32 — XLA:CPU upcasts bf16; on chip the image/embedding payloads are
    bf16/f32 with the same dims, so dims-exact assertions transfer).
    """
    from vince_tpu.solvers.vince_step import init_vince_state

    state_shapes = jax.eval_shape(
        lambda r: init_vince_state(r, cfg, optimizer), jax.random.PRNGKey(0)
    )

    def nbytes(tree):
        return int(sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(tree)
        ))

    d = cfg.data_axis_size
    img = cfg.image_size
    elt = 4  # CPU HLO element size (f32)
    return {
        # grads are param-dtype (f32): the data-axis pmean and (mq>1) the
        # queue-axis psum each move the whole tree
        "param_bytes": nbytes(state_shapes.params),
        # new_batch_stats AND key_batch_stats are pmean'd over data
        "stat_bytes": nbytes(state_shapes.batch_stats),
        # shuffled-BN 'gather' mode: every chip receives the global key batch
        # [d·b, H, W, 3] (ops/queue shuffle; reference vince_model.py:137-142)
        "img_gather_bytes": d * batch_per_chip * img * img * 3 * elt,
        "img_gather_dims": (d * batch_per_chip, img, img, 3),
        # 'a2a' mode: the balanced shuffle's instruction carries exactly the
        # local batch (b rows, split d ways) — 1/d of the gather payload;
        # (d-1)/d of those rows leave the chip
        "a2a_bytes": batch_per_chip * img * img * 3 * elt,
        # key-embedding unshuffle / MoCo concat_all_gather: [d·b, D] f32
        "embed_gather_bytes": d * batch_per_chip * cfg.embed_size * 4,
        "embed_gather_dims": (d * batch_per_chip, cfg.embed_size),
        # streaming-softmax psum pairs + metric scalars ride along — small
        "small_slack_bytes": 4096,
    }


def summarize(colls):
    agg = collections.Counter()
    bytes_agg = collections.Counter()
    for c in colls:
        key = (c["op"], c["axis"])
        agg[key] += 1
        bytes_agg[key] += c["bytes"]
    return agg, bytes_agg


def compare_shuffle_modes(md: int, mq: int, batch: int, image: int,
                          qsize: int, backbone: str):
    """Measure TOTAL per-step collective traffic in gather vs a2a shuffled-BN
    mode on the same geometry (VERDICT r3 item 8: the a2a path's 1/d
    interconnect claim was analytic — this closes the loop on compiled HLO).
    Returns {mode: {"total_mb", "per_op": rows}}; a2a must move less."""
    out = {}
    for mode in ("gather", "a2a"):
        cfg, colls, _, _, _ = audit(md, mq, batch, image, qsize, backbone, mode)
        agg, bytes_agg = summarize(colls)
        total = sum(bytes_agg.values())
        out[mode] = {
            "total_mb": round(total / 1e6, 3),
            "per_op": [
                {"op": op, "axis": axis, "count": agg[(op, axis)],
                 "mbytes": round(bytes_agg[(op, axis)] / 1e6, 3)}
                for (op, axis) in sorted(agg)
            ],
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CI): R18, b=8@64, q=1024")
    ap.add_argument("--json", default="")
    ap.add_argument("--shuffle-mode", default="gather", choices=["gather", "a2a"])
    ap.add_argument("--meshes", default="8x1,4x2,2x4")
    ap.add_argument("--compare-shuffle-modes", action="store_true",
                    help="run BOTH shuffle modes per mesh and report the "
                         "total-traffic delta (SCALING.md numbers)")
    args = ap.parse_args()

    if args.compare_shuffle_modes:
        if args.quick:
            batch, image, qsize, backbone = 8, 64, 1024, "ResNet18"
        else:
            batch, image, qsize, backbone = 128, 224, 65536, "ResNet50"
        results = {}
        for mesh_str in args.meshes.split(","):
            md, mq = (int(x) for x in mesh_str.split("x"))
            cmp = compare_shuffle_modes(md, mq, batch, image, qsize, backbone)
            g, a = cmp["gather"]["total_mb"], cmp["a2a"]["total_mb"]
            print(f"mesh {md}x{mq}: gather {g:.1f} MB/step vs a2a {a:.1f} "
                  f"MB/step  (a2a = {a / g:.3f}x)   [CPU-HLO f32 bytes = 2x "
                  f"the on-chip bf16 numbers; ratios transfer]")
            results[mesh_str] = cmp
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=1)
            print(f"wrote {args.json}")
        return

    if args.quick:
        batch, image, qsize, backbone = 8, 64, 1024, "ResNet18"
    else:
        batch, image, qsize, backbone = 128, 224, 65536, "ResNet50"

    results = {}
    for mesh_str in args.meshes.split(","):
        md, mq = (int(x) for x in mesh_str.split("x"))
        cfg, colls, hlo, t_lower, t_compile = audit(
            md, mq, batch, image, qsize, backbone, args.shuffle_mode)
        agg, bytes_agg = summarize(colls)
        # the failure mode to exclude: the queue bank moving through a
        # gather-class collective (any result dim == queue shard or global size)
        qdims = {cfg.queue_shard_size, cfg.queue_size}
        big = [
            c for c in colls
            if c["op"] in ("all-gather", "all-to-all")
            and any(
                int(d) in qdims
                for m in _SHAPE_RE.finditer(c["shape"])
                for d in m.group(2).split(",") if d
            )
        ]
        print(f"\n=== mesh {md}x{mq} ({args.shuffle_mode}) — "
              f"lower {t_lower:.0f}s compile {t_compile:.0f}s ===")
        rows = []
        for (op, axis), n in sorted(agg.items()):
            mb = bytes_agg[(op, axis)] / 1e6
            print(f"  {op:20s} axis={axis:6s} count={n:3d} total={mb:9.2f} MB")
            rows.append({"op": op, "axis": axis, "count": n, "mbytes": round(mb, 3)})
        if big:
            print(f"  !! {len(big)} gather-class collectives move the queue bank:")
            for c in big:
                print(f"     {c['op']} {c['shape']} ({c['bytes']/1e6:.1f} MB)")
        results[mesh_str] = {
            "collectives": rows,
            "queue_gathers": len(big),
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "config": {"backbone": backbone, "batch_per_chip": batch,
                       "image": image, "queue": qsize,
                       "shuffle_mode": args.shuffle_mode},
        }

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
