#!/usr/bin/env bash
# Round-4 second chip session (keep the host CPU quiet — the axon tunnel
# starves under CPU load, CLAUDE.md):
#   1. jigsaw CONTROLS at the sustaining config (lr 0.003 / m 0.999): the
#      16k-step negative (docs/jigsaw_best_r4.json) optimizes loss but never
#      separates the positive from the hardest negative. Two controls pinpoint
#      which ingredient blocks it:
#        a. --identity-perms  — full jigsaw path, no permutation: if this also
#           stays flat, permutation-invariance is NOT the blocker
#        b. --both-sides      — jigsaw head on BOTH encoders (like plain, one
#           head): if this learns, the blocker is the cross-head alignment of
#           the reference's 50/50 alternation (plain embedding vs jigsaw head)
#   2. texture-family convergence soak EXTENDED to 12 epochs (r4 first session
#      stopped at 6 epochs / val acc 0.0505 climbing) — shows where the
#      non-color-separable curve goes
# Writes everything under $OUT (default /tmp/chip_r4b).
set -u
OUT="${OUT:-/tmp/chip_r4b}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run NAME CMD...
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# ---- 1. jigsaw controls at the sustaining config ----------------------------
run jigsaw_idperm python tools/soak_jigsaw.py --steps 4000 \
  --lr 0.003 --momentum 0.999 --identity-perms \
  --out "$OUT/jigsaw_idperm_r4.json"
run jigsaw_both python tools/soak_jigsaw.py --steps 4000 \
  --lr 0.003 --momentum 0.999 --both-sides \
  --out "$OUT/jigsaw_both_r4.json"
run jigsaw_both_idperm python tools/soak_jigsaw.py --steps 4000 \
  --lr 0.003 --momentum 0.999 --both-sides --identity-perms \
  --out "$OUT/jigsaw_both_idperm_r4.json"

# ---- 2. texture soak, 12 epochs ---------------------------------------------
SOAK_ARGS=(
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticTextureVideoDataset
  --transform StandardVideoTransform --use-videos --inter-batch-comparison
  --base-lr 0.03 --compute-dtype bfloat16 --bn-fold expand
  --input-width 64 --input-height 64
  --base-logdir "$OUT/logs" --save-frequency 500 --log-frequency 100
  --mesh-data-size 1 --mesh-queue-size 1 --num-workers 2
  --synthetic-num-videos 256
)
run soak_texture_q262144_12ep python solver_runner.py \
  --title soak_texture_q262144_12ep --description texq12 \
  --batch-size 128 --num-frames 4 \
  --vince-queue-size 262144 --vince-embedding-size 128 \
  --epochs 12 --iterations-per-epoch 500 \
  "${SOAK_ARGS[@]}"

echo "=== chip session done $(date +%H:%M:%S) ==="
