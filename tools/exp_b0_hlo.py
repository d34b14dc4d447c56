#!/usr/bin/env python
"""Map compiled-HLO fusion names to their op contents for the B0 step, then
join against a captured trace (/tmp/proftrace) to attribute fusion time to
depthwise convs vs dots vs elementwise. Companion to profile_step.py."""
import glob, gzip, json, os, re, sys, collections
import numpy as np
import jax, jax.numpy as jnp, optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
from vince_tpu.parallel.mesh import MeshSpec, make_mesh
from vince_tpu.solvers.vince_step import (
    SourceSpec, VinceConfig, init_vince_state, make_train_step, shard_state)

BATCH = int(os.environ.get("PROF_BATCH", 128))
cfg = VinceConfig(
    sources=(SourceSpec("YT", batch_size=BATCH, num_frames=4,
                        transform="StandardVideoTransform", source_id=1),),
    backbone=os.environ.get("PROF_BACKBONE", "EfficientNetB0"),
    embed_size=128, image_size=224, queue_size=65536,
    compute_dtype=jnp.bfloat16, data_axis_size=1, queue_axis_size=1,
    shuffle_bn=True, bn_fold=os.environ.get("PROF_BN_FOLD", "expand"),
    dw_kind=os.environ.get("PROF_DW_KIND", "conv"),
)
mesh = make_mesh(MeshSpec(1, 1))
opt = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))
with jax.default_device(jax.devices("cpu")[0]):
    state = init_vince_state(jax.random.PRNGKey(0), cfg, opt)
state = shard_state(state, mesh)
step = make_train_step(cfg, opt, mesh)
canvas = 256
host = np.random.RandomState(0).randint(0, 256, (BATCH, canvas, canvas, 3), np.uint8)
batch = ({"data": jax.device_put(host, jax.devices()[0]),
          "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0])},)
key = jax.random.PRNGKey(1)
txt = step.lower(state, batch, key).compile().as_text()
print(f"HLO text: {len(txt)} chars", file=sys.stderr)

# fusion computation name -> set of interesting ops inside
comp_ops = {}
cur = None
for line in txt.splitlines():
    m = re.match(r"%?(\S+) \([^)]*\) -> .* \{", line)
    if m:
        cur = m.group(1); comp_ops[cur] = collections.Counter(); continue
    if cur is None: continue
    if "convolution(" in line:
        g = re.search(r"feature_group_count=(\d+)", line)
        comp_ops[cur]["dwconv" if (g and int(g.group(1)) > 1) else "conv"] += 1
    elif re.search(r"= \S+ dot\(", line): comp_ops[cur]["dot"] += 1
    elif re.search(r"= \S+ reduce\(", line): comp_ops[cur]["reduce"] += 1

# instruction name (e.g. fusion.4050) -> computation it calls
inst_comp = {}
for m in re.finditer(r"%?([\w.-]+) = .*? fusion\(.*?calls=%?([\w.-]+)", txt):
    inst_comp[m.group(1)] = m.group(2)
print(f"{len(inst_comp)} fusion instructions mapped", file=sys.stderr)

def kind_of(inst):
    comp = inst_comp.get(inst)
    ops = comp_ops.get(comp, collections.Counter()) if comp else collections.Counter()
    if ops.get("dwconv"): return "depthwise-conv fusion"
    if ops.get("conv"): return "dense-conv fusion"
    if ops.get("dot"): return "dot fusion"
    if ops.get("reduce"): return "reduce fusion"
    return "elementwise fusion"

f = glob.glob("/tmp/proftrace/**/*.trace.json.gz", recursive=True)[0]
tr = json.load(gzip.open(f, "rt"))
names = {}
for ev in tr["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        names[ev["pid"]] = ev["args"].get("name", "")
tpu_pids = {p for p, n in names.items() if "TPU" in n or "/device" in n.lower()}
cat_t = collections.Counter(); cat_b = collections.Counter(); cat_n = collections.Counter()
STEPS = 3
miss = 0
for ev in tr["traceEvents"]:
    if ev.get("ph") == "X" and ev.get("pid") in tpu_pids and "dur" in ev:
        nm = ev["name"]
        if nm.startswith("jit_wrapped") or nm.isdigit(): continue
        if nm.startswith("copy") or nm.startswith("slice"):
            c = "copies/slices"
        elif "fusion" in nm:
            c = kind_of(nm)
            if nm not in inst_comp: miss += 1
        elif nm.startswith("convolution"):
            c = "bare conv op"
        else:
            c = "other"
        cat_t[c] += ev["dur"]; cat_n[c] += 1
        try: cat_b[c] += int(ev.get("args", {}).get("bytes_accessed", 0))
        except Exception: pass
print(f"(unmapped fusion events: {miss//STEPS}/step)")
print(f"{'category':26s} {'ms/step':>8s} {'GB/step':>8s} {'GB/s':>6s} {'TF/s? n':>8s}")
for c, us in cat_t.most_common():
    gb = cat_b[c]/STEPS/1e9; ms = us/1e3/STEPS
    print(f"{c:26s} {ms:8.2f} {gb:8.2f} {gb/ms*1e3 if ms else 0:6.0f} {cat_n[c]//STEPS:8d}")
