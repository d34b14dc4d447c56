#!/usr/bin/env bash
# Round-5 chip session (keep the host CPU quiet — the axon tunnel starves
# under CPU load, CLAUDE.md). Runs, in order:
#   1. bench sanity under the new median-of-3 protocol (tunnel health +
#      BENCH_r05 preview with spread fields).
#   2. MXU positive control (VERDICT r4 item 5): ResNet50w2 (and w4) through
#      the SAME bench/mxu accounting — roofline ceilings 71%/82%, so a >50%
#      reading validates the measurement chain.
#   3. jigsaw alternation + PIRL cross-head alignment on the pinned config
#      where plain learns and plain alternation stays at chance
#      (docs/jigsaw_best_r4.json control) → docs/jigsaw_alternate_fixed_r5.json.
#   4. LARS vs SGD legs (VERDICT r4 item 3; config from chip_session_r4c.sh §3).
#   5. end-task probes on the non-color-separable texture family
#      (VERDICT r4 item 7) → docs/texture_end_tasks_r5.json.
# Writes everything under $OUT (default /tmp/chip_r5).
set -u
OUT="${OUT:-/tmp/chip_r5}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run NAME CMD...
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# ---- 1. headline sanity (median-of-3, 30 steps) ------------------------------
run bench_r50 python bench.py

# ---- 2. MXU positive control -------------------------------------------------
BENCH_BACKBONE=ResNet50w2 run bench_r50w2 python bench.py
BENCH_BACKBONE=ResNet50w4 BENCH_BATCH=64 run bench_r50w4 python bench.py

# ---- 3. alternating jigsaw + alignment remedy --------------------------------
# pinned config = docs/jigsaw_best_r4.json (lr 3e-3, m .999, tau .07): plain
# alternation stays <= 1/batch at 16k steps; the align term must separate.
run jigsaw_align python tools/soak_jigsaw.py \
  --steps 8000 --lr 0.003 --momentum 0.999 --tau 0.07 \
  --align-weight 1.0 --out docs/jigsaw_align_only_r5.json

# ---- 4. LARS vs SGD (same pinned synthetic-video task, 3 epochs each) --------
COMMON_ARGS=(
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticVideoDataset
  --transform StandardVideoTransform --use-videos --inter-batch-comparison
  --batch-size 128 --num-frames 4
  --vince-queue-size 4096 --vince-embedding-size 128
  --epochs 3 --iterations-per-epoch 500
  --compute-dtype bfloat16 --bn-fold expand
  --input-width 64 --input-height 64
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2
  --synthetic-num-videos 256
)
run soak_sgd_3ep python solver_runner.py \
  --title soak_sgd_3ep --description sgd3 --base-lr 0.03 \
  "${COMMON_ARGS[@]}"
run soak_lars_3ep python solver_runner.py \
  --title soak_lars_3ep --description lars3 --optimizer lars --base-lr 0.15 \
  "${COMMON_ARGS[@]}"

# ---- 5. texture end-task probes ----------------------------------------------
run texture_end_tasks python tools/texture_end_tasks.py \
  --pretrain-steps 4000 --probe-iters 400 --tracking-iters 200 \
  --workdir "$OUT/texture_et" --out docs/texture_end_tasks_r5.json

echo "=== chip session done $(date +%H:%M:%S) ==="
