#!/usr/bin/env bash
# Round-4 real-chip session (run with the host CPU otherwise quiet — the
# axon tunnel starves under CPU load, CLAUDE.md):
#   1. headline re-bench through the new wedge-proof harness (VERDICT r3 #1)
#   2. compiler-options sweep vs the 65.8→47.3 ms roofline gap (r3 #2)
#   3. jigsaw long-horizon soak, 8k steps + plain-path control (r3 #3)
#   4. texture-family (non-color-separable) convergence soak at q=262144
#      (r3 #4) — NCE accuracy above chance here cannot be a color histogram
# Writes everything under $OUT (default /tmp/chip_r4).
set -u
OUT="${OUT:-/tmp/chip_r4}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run NAME CMD...
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# ---- 1. headline bench (wedge-proof harness; retries internally) -----------
run bench_r50_headline env BENCH_STEPS=20 BENCH_TIMEOUT=1200 python bench.py

# ---- 2. compiler-flag sweep (each config compiles + times 10 steps) --------
run compiler_flags python tools/exp_compiler_flags.py \
  --steps 10 --out "$OUT/compiler_flags_r4.json"

# ---- 3. jigsaw long soak + plain control ------------------------------------
run jigsaw_soak python tools/soak_jigsaw.py --steps 8000 \
  --out "$OUT/jigsaw_soak_r4.json"
run jigsaw_plain_control python tools/soak_jigsaw.py --steps 2000 --plain \
  --out "$OUT/jigsaw_plain_r4.json"

# ---- 4. texture-family convergence soak at q=262144 ------------------------
# identical recipe to the r3 color-family soak (chip_session_r3.sh §4a) with
# only the dataset swapped — any accuracy gap isolates the color shortcut
SOAK_ARGS=(
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticTextureVideoDataset
  --transform StandardVideoTransform --use-videos --inter-batch-comparison
  --base-lr 0.03 --compute-dtype bfloat16 --bn-fold expand
  --input-width 64 --input-height 64
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2
  --synthetic-num-videos 256
)
run soak_texture_q262144 python solver_runner.py \
  --title soak_texture_q262144 --description texq \
  --batch-size 128 --num-frames 4 \
  --vince-queue-size 262144 --vince-embedding-size 128 \
  --epochs 6 --iterations-per-epoch 500 \
  "${SOAK_ARGS[@]}"

echo "=== chip session done $(date +%H:%M:%S) ==="
grep -h '"metric"' "$OUT"/bench_*.log || true
