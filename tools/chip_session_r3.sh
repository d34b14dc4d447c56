#!/usr/bin/env bash
# Round-3 real-chip session (run with the host CPU otherwise quiet — the
# axon tunnel starves under CPU load, CLAUDE.md):
#   1. re-bench the headline R50 step after the jitter/barrier changes
#   2. ms/step datapoints at q=262144 and q=1048576 (fused InfoNCE)
#   3. EfficientNet B0–B4 step datapoints (VERDICT r2 weak #2)
#   4. big-bank training soaks: q=262144 (wraparound + mid-run resume) and
#      q=1048576 — convergence curves on synthetic video (VERDICT r2 #2)
# Writes everything under $OUT (default /tmp/chip_r3).
set -u
OUT="${OUT:-/tmp/chip_r3}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run NAME CMD...
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# ---- 1. headline re-bench + ColorJitter A/B --------------------------------
run bench_r50_q65536 env BENCH_STEPS=20 python bench.py
run bench_r50_jitter_fixed env BENCH_JITTER=fixed BENCH_STEPS=10 python bench.py

# ---- 1b. staging-path saturation proof (VERDICT r2 #8) ---------------------
run bench_loader env LB_STEPS=20 python tools/bench_loader.py

# ---- 2. big-queue step datapoints (R50 b=128@224) --------------------------
run bench_r50_q262144 env BENCH_QUEUE=262144 BENCH_FUSED=1 BENCH_STEPS=10 python bench.py
run bench_r50_q1048576 env BENCH_QUEUE=1048576 BENCH_FUSED=1 BENCH_STEPS=10 python bench.py

# ---- 3. EfficientNet family datapoints -------------------------------------
for B in 0 1 2 3 4; do
  run "bench_effnet_b$B" env "BENCH_BACKBONE=EfficientNetB$B" BENCH_STEPS=10 python bench.py
done

# ---- 3b. per-fusion traffic accounting (VERDICT r2 #7; compile-only) -------
run traffic_table python tools/traffic_table.py --save "$OUT/r50_step_opt.hlo" --top 40

# ---- 4a. q=262144 training soak: 6 epochs x 500 steps, wraparound at 2048 --
SOAK_ARGS=(
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticVideoDataset
  --transform StandardVideoTransform --use-videos --inter-batch-comparison
  --base-lr 0.03 --compute-dtype bfloat16 --bn-fold expand
  --input-width 64 --input-height 64
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2
  --synthetic-num-videos 256
)
run soak_q262144 python solver_runner.py \
  --title soak_q262144 --description bigq \
  --batch-size 128 --num-frames 4 \
  --vince-queue-size 262144 --vince-embedding-size 128 \
  --epochs 6 --iterations-per-epoch 500 \
  "${SOAK_ARGS[@]}"

# resume for one more epoch: checkpoint-restore at big q (512 MB bank state)
run soak_q262144_resume python solver_runner.py \
  --title soak_q262144 --description bigq \
  --batch-size 128 --num-frames 4 \
  --vince-queue-size 262144 --vince-embedding-size 128 \
  --epochs 7 --iterations-per-epoch 500 \
  "${SOAK_ARGS[@]}"

# ---- 4b. q=1048576 soak: 10 epochs x 500; full bank turn at 4096 steps -----
run soak_q1048576 python solver_runner.py \
  --title soak_q1048576 --description bigq \
  --batch-size 256 --num-frames 2 \
  --vince-queue-size 1048576 --vince-embedding-size 128 \
  --epochs 10 --iterations-per-epoch 500 \
  "${SOAK_ARGS[@]}"

echo "=== chip session done $(date +%H:%M:%S) ==="
grep -h '"metric"' "$OUT"/bench_*.log || true
