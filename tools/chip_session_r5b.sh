#!/usr/bin/env bash
# Round-5 follow-up chip session: the warmup-both remedy for the reference's
# alternating jigsaw (VERDICT r4 item 2, remedy candidate 2).
#
# Round-5 attempt 1 (docs/jigsaw_align_only_r5.json): the PIRL align term
# alone UNPINS the loss (6.30 -> 5.59 over 8k steps, vs the r4 alternation
# pinned at ln(544)) but accuracy stays at the control level (0.0137 vs
# 0.0146). Attempt 2 stacks the round-4 diagnosis directly: run the mode
# that demonstrably learns (both-sides, 0.35@4k and climbing) long enough
# to align the jigsaw head and encoder into one space, then hand off to the
# reference's 50/50 alternation. Two legs separate the warmup effect from
# the align term.
set -u
OUT="${OUT:-/tmp/chip_r5b}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")"
}

PINNED=(--lr 0.003 --momentum 0.999 --tau 0.07 --steps 12000 --warmup-both 4000)

run jigsaw_warmup_align python tools/soak_jigsaw.py \
  "${PINNED[@]}" --align-weight 1.0 --out docs/jigsaw_warmup_alt_r5.json

run jigsaw_warmup_noalign python tools/soak_jigsaw.py \
  "${PINNED[@]}" --align-weight 0.0 --out docs/jigsaw_warmup_noalign_r5.json

echo "=== chip session r5b done $(date +%H:%M:%S) ==="
