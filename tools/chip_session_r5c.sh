#!/usr/bin/env bash
# Round-5 production-CLI jigsaw legs: does the warmup remedy hold at the
# production config (b=128, q=4096, bf16, 4-frame multi-pair), driven by the
# REAL CLI (solver_runner.py), not the soak harness?
#   1. control: reference-parity 50/50 alternation (expected: stays low —
#      the toy-scale attractor evidence is docs/jigsaw_best_r4.json).
#   2. remedy: --jigsaw-warmup-steps 1500 (3 of 8 epochs both-sides, then
#      the reference's alternation). Success = the val curve keeps climbing
#      after the epoch-3 handoff.
# Anchors at this exact config: plain 0.046->0.887 over 10 epochs;
# --jigsaw-sides both 0.594->0.818 over 8 epochs (docs/jigsaw_both_cli_r4.json).
set -u
OUT="${OUT:-/tmp/chip_r5c}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

COMMON=(
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticVideoDataset
  --transform StandardVideoTransform --use-videos --inter-batch-comparison
  --batch-size 128 --num-frames 4
  --vince-queue-size 4096 --vince-embedding-size 128
  --epochs 8 --iterations-per-epoch 500
  --base-lr 0.03 --compute-dtype bfloat16 --bn-fold expand
  --input-width 64 --input-height 64
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2
  --synthetic-num-videos 256
)

run jigsaw_alt_cli python solver_runner.py \
  --title jigsaw_alt_cli --description jalt --jigsaw \
  "${COMMON[@]}"

run jigsaw_warmup_cli python solver_runner.py \
  --title jigsaw_warmup_cli --description jwarm --jigsaw \
  --jigsaw-warmup-steps 1500 \
  "${COMMON[@]}"

echo "=== chip session r5c done $(date +%H:%M:%S) ==="
