#!/usr/bin/env python
"""Per-fusion traffic accounting for the production R50 step (VERDICT r2 #7).

docs/PERFORMANCE.md bounds the step at the HBM roofline but leaves the 2.1×
ratio (61.9 GB streamed vs 30.0 GB minimal single-read traffic) asserted
rather than attributed. This tool makes the accounting explicit from the
TPU-compiled optimized HLO:

  - per-instruction bytes: each entry-computation instruction reads its
    operands and writes its output (tile padding ignored — lower bound);
  - re-read attribution: a value consumed by k top-level instructions is
    streamed from HBM up to k times; re_read = bytes × (k−1), grouped by the
    producer's source op (HLO metadata op_name), answers "which fusions
    re-read which operands";
  - a residual term: conv instructions internally re-read windows/operands
    beyond what operand-sum accounting sees (im2col / K-loop re-streaming) —
    the gap between this model's total and the trace-measured 61.9 GB.

Usage:
  python tools/traffic_table.py                # compile on the attached TPU
  python tools/traffic_table.py --hlo FILE     # re-analyze a saved HLO dump
  env: TT_BATCH/TT_IMAGE/TT_BACKBONE/TT_QUEUE as in profile_step.py
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string; handles tuples by summing elements.
    Layout/tiling annotations (``{3,2,1,0:T(8,128)}``) are ignored."""
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


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*(\([^)]*\)|[\w\[\]{},:()\s]*?[\w\]}])\s+"
    r"([\w\-]+)\((.*)$"
)
_METADATA_RE = re.compile(r'op_name="([^"]*)"')


def parse_entry(hlo_text: str):
    """Parse the ENTRY computation: list of dicts with name, shape_str,
    opcode, operands (names), op_name metadata."""
    lines = hlo_text.splitlines()
    out = []
    in_entry = False
    depth = 0
    for ln in lines:
        if not in_entry:
            if ln.startswith("ENTRY "):
                in_entry = True
                depth = ln.count("{") - ln.count("}")
            continue
        depth += ln.count("{") - ln.count("}")
        if depth < 0 or ln.strip() == "}":
            break
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, shape_str, opcode, rest = m.groups()
        # operand list = %-tokens inside the first paren group (metadata and
        # calls= come after the closing paren; %-refs there are computations,
        # not values — cut at the first ")," boundary or metadata marker)
        arg_end = rest.find("), ")
        args_str = rest if arg_end < 0 else rest[:arg_end]
        operands = re.findall(r"%[\w.\-]+", args_str.split(" calls=")[0])
        meta = _METADATA_RE.search(ln)
        kind = re.search(r"kind=(k\w+)", ln)
        out.append({
            "name": name.lstrip("%"),
            "shape": shape_str,
            "bytes_out": shape_bytes(shape_str),
            "opcode": opcode,
            "kind": kind.group(1) if kind else "",
            "operands": [o.lstrip("%") for o in operands],
            "op_name": meta.group(1) if meta else "",
        })
    return out


def op_stem(op_name: str, opcode: str) -> str:
    """Short human label: last 2 path segments of the jax op_name."""
    if not op_name:
        return opcode
    parts = [p for p in op_name.split("/") if p]
    return "/".join(parts[-2:]) if len(parts) > 1 else parts[-1]


def analyze(hlo_text: str, top: int = 30):
    instrs = parse_entry(hlo_text)
    by_name = {i["name"]: i for i in instrs}
    consumers = collections.defaultdict(list)
    for i in instrs:
        seen = set()
        for o in i["operands"]:
            if o in by_name and o not in seen:  # one stream per distinct operand
                consumers[o].append(i["name"])
                seen.add(o)

    def read_bytes(instr):
        # get-tuple-element reads one tuple element = its own output size
        if instr["opcode"] == "get-tuple-element":
            return instr["bytes_out"]
        return sum(by_name[o]["bytes_out"] for o in set(instr["operands"])
                   if o in by_name)

    rows = []
    total_read = total_write = 0
    for i in instrs:
        if i["opcode"] in ("parameter", "constant", "get-tuple-element", "tuple",
                           "bitcast"):
            continue
        r, w = read_bytes(i), i["bytes_out"]
        total_read += r
        total_write += w
        rows.append((r + w, r, w, i))
    rows.sort(reverse=True, key=lambda t: t[0])

    print(f"entry instructions: {len(instrs)}; traffic model "
          f"(operand-sum, no tile padding): read {total_read/1e9:.1f} GB + "
          f"write {total_write/1e9:.1f} GB = {(total_read+total_write)/1e9:.1f} GB")

    # modeled bytes grouped by instruction class — lines up against the
    # trace's category table (PERFORMANCE.md "Where the time goes") so the
    # measured-minus-modeled gap can be attributed per class
    by_class = collections.Counter()
    n_class = collections.Counter()
    for tot, r, w, i in rows:
        is_convdot = ("conv" in i["op_name"] or "dot_general" in i["op_name"]
                      or i["opcode"] in ("convolution", "dot"))
        if i["opcode"] == "fusion":
            cls = (f"fusion {i['kind']}"
                   + ("/convdot" if is_convdot and i["kind"] == "kOutput" else ""))
        elif i["opcode"] in ("copy", "copy-start", "copy-done"):
            cls = "copy"
        else:
            cls = i["opcode"]
        by_class[cls] += tot
        n_class[cls] += 1
    print("\n== modeled GB by instruction class ==")
    for cls, b in by_class.most_common(12):
        print(f"{b/1e9:8.1f}  x{n_class[cls]:5d}  {cls}")
    print(f"\n== top {top} instructions by modeled bytes ==")
    print(f"{'GB':>7} {'read':>7} {'write':>7}  {'opcode':<18} op")
    for tot, r, w, i in rows[:top]:
        print(f"{tot/1e9:7.3f} {r/1e9:7.3f} {w/1e9:7.3f}  {i['opcode']:<18} "
              f"{op_stem(i['op_name'], i['opcode'])}")

    # ---- re-read attribution -------------------------------------------
    reread = []
    for val, cons in consumers.items():
        k = len(cons)
        if k <= 1:
            continue
        b = by_name[val]["bytes_out"]
        if b == 0:
            continue
        reread.append((b * (k - 1), b, k, by_name[val], cons))
    reread.sort(reverse=True, key=lambda t: t[0])
    total_reread = sum(t[0] for t in reread)
    print(f"\n== re-read traffic: values with >1 consumer "
          f"(total {total_reread/1e9:.1f} GB extra) ==")
    print(f"{'GB xtra':>8} {'MB':>8} {'k':>3}  producer (op) → consumers")
    for extra, b, k, prod, cons in reread[:top]:
        cons_ops = collections.Counter(
            by_name[c]["opcode"] for c in cons
        )
        cons_s = ",".join(f"{o}×{n}" for o, n in cons_ops.most_common(3))
        print(f"{extra/1e9:8.3f} {b/1e6:8.1f} {k:3d}  "
              f"{op_stem(prod['op_name'], prod['opcode'])} → {cons_s}")

    # group re-reads by producer stem
    by_stem = collections.Counter()
    for extra, b, k, prod, cons in reread:
        stem = op_stem(prod["op_name"], prod["opcode"]).split(" ")[0]
        by_stem[stem.split("/")[-1].split(".")[0]] += extra
    print("\n== re-read GB grouped by producer op kind ==")
    for stem, extra in by_stem.most_common(15):
        print(f"{extra/1e9:8.3f}  {stem}")
    return total_read + total_write, total_reread


def build_and_compile():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec, VinceConfig, init_vince_state, make_train_step_fn, shard_state,
    )

    batch = int(os.environ.get("TT_BATCH", 128))
    image = int(os.environ.get("TT_IMAGE", 224))
    cfg = VinceConfig(
        sources=(SourceSpec("YT", batch_size=batch, num_frames=4,
                            transform="StandardVideoTransform", source_id=1),),
        backbone=os.environ.get("TT_BACKBONE", "ResNet50"),
        embed_size=128, image_size=image,
        queue_size=int(os.environ.get("TT_QUEUE", 65536)),
        compute_dtype=jnp.bfloat16, data_axis_size=1, queue_axis_size=1,
        shuffle_bn=True, stem_kind="s2d", bn_fold="expand",
    )
    mesh = make_mesh(MeshSpec(1, 1))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
    state = shard_state(state, mesh)
    import jax as _jax
    step = _jax.jit(make_train_step_fn(cfg, opt, mesh), donate_argnums=(0,))
    canvas = int(image / 0.875)
    host = np.random.RandomState(0).randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
    b = ({"data": host, "queue_data": host[::-1].copy()},)
    compiled = step.lower(state, b, jax.random.PRNGKey(1)).compile()
    return compiled.as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", default="", help="saved optimized-HLO text file")
    ap.add_argument("--save", default="/tmp/r50_step_opt.hlo")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    if args.hlo:
        text = open(args.hlo).read()
    else:
        text = build_and_compile()
        if args.save:
            with open(args.save, "w") as f:
                f.write(text)
            print(f"saved optimized HLO → {args.save} ({len(text)/1e6:.1f} MB)")
    analyze(text, args.top)


if __name__ == "__main__":
    main()
