#!/usr/bin/env bash
# Round-4 third chip session (keep the host CPU quiet — the axon tunnel
# starves under CPU load, CLAUDE.md):
#   1. headline sanity: one bench.py run (compile cache warm from earlier
#      sessions) — confirms the tunnel is healthy and the ~66 ms / ~1950 f/s
#      record reproduces before the driver's end-of-round BENCH_r04 run.
#   2. the shipped `--jigsaw-sides both` option through the PRODUCTION CLI
#      (solver_runner.py), not the diagnostic harness: the controls
#      (docs/jigsaw_both_r4.json) proved both-sides learns at toy scale where
#      the reference's alternation stays at chance; this run shows the same
#      through the real training loop (augmentation, queue prefill, val,
#      checkpoints) on the synthetic-video task whose plain-path trajectory
#      is pinned (STATUS.md: 0.046 → 0.887 over 10 epochs at this config).
# Writes everything under $OUT (default /tmp/chip_r4c).
set -u
OUT="${OUT:-/tmp/chip_r4c}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run NAME CMD...
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# ---- 1. headline sanity ------------------------------------------------------
run bench_sanity python bench.py

# ---- 2. jigsaw-both through the production CLI -------------------------------
# Plain-path reference trajectory at this exact config: val NCE accuracy
# 0.046 → 0.887 over 10 epochs (STATUS.md round-1 soaks). Jigsaw halves the
# effective learning signal per step (keys patchified too), so run 8 epochs
# and read the curve, not the endpoint.
run soak_jigsaw_both_cli python solver_runner.py \
  --title soak_jigsaw_both_cli --description jboth \
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticVideoDataset \
  --transform StandardVideoTransform --use-videos --inter-batch-comparison \
  --jigsaw --jigsaw-sides both \
  --batch-size 128 --num-frames 4 \
  --vince-queue-size 4096 --vince-embedding-size 128 \
  --epochs 8 --iterations-per-epoch 500 \
  --base-lr 0.03 --compute-dtype bfloat16 --bn-fold expand \
  --input-width 64 --input-height 64 \
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100 \
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2 \
  --synthetic-num-videos 256

# ---- 3. LARS vs SGD on the pinned synthetic-video task -----------------------
# Same config both legs (3 epochs × 500 steps, q=4096, 64²); SGD is the known
# trajectory family (STATUS.md round-1: 0.046 → 0.887 over 10 epochs). LARS
# uses the linear-scaling starting LR (0.3 · b/256, SimCLR recipe).
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

echo "=== chip session done $(date +%H:%M:%S) ==="
