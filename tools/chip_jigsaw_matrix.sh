#!/usr/bin/env bash
# Round-4 jigsaw follow-up: the first 8k-step soak collapsed to uniform
# (loss = ln(544), acc 0) and the PLAIN control at the identical config also
# degenerated (acc pinned at 1/batch) — so the config, not the jigsaw
# objective, was at fault. Phase 1 sweeps plain configs for one that SUSTAINS
# learning over 4k steps; phase 2 runs jigsaw long-horizon at the best one.
set -u
OUT="${OUT:-/tmp/chip_r4}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

# phase 1: plain-path config sweep (4k steps each; anti-collapse levers:
# lower lr, slower EMA, softer temperature, smaller batch)
run plain_lr003_m999 python tools/soak_jigsaw.py --plain --steps 4000 \
  --lr 0.003 --momentum 0.999 --out "$OUT/plain_lr003_m999.json"
run plain_lr01_m999_tau2 python tools/soak_jigsaw.py --plain --steps 4000 \
  --lr 0.01 --momentum 0.999 --tau 0.2 --out "$OUT/plain_lr01_m999_tau2.json"
run plain_b16_lr01 python tools/soak_jigsaw.py --plain --steps 4000 \
  --batch 16 --lr 0.01 --momentum 0.99 --out "$OUT/plain_b16_lr01.json"

echo "=== phase 1 done; pick the best and run phase 2 manually: ==="
echo "python tools/soak_jigsaw.py --steps 16000 <best flags> --out $OUT/jigsaw_best.json"
