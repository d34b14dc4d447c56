#!/usr/bin/env bash
# Multi-host pod launch: run this SAME script on every controller host of a
# TPU pod slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
# On TPU pods jax.distributed auto-detects the coordinator, so no extra
# flags are needed; each host's loaders feed its slice of the global batch
# (docs/SCALING.md "Multi-host (pods)"). For manual clusters pass
#   --coordinator-address host0:port --num-processes N --process-id $I
# through "$@".
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r18-b-256-q-65536-pod \
  --solver VinceSolver --backbone ResNet18 --dataset R2V2Dataset \
  --transform StandardVideoTransform \
  --batch-size 256 --base-lr 0.03 \
  --vince-embedding-size 64 --vince-queue-size 65536 \
  --vince-momentum 0.999 --vince-temperature 0.07 \
  --epochs 200 --lr-decay-type step \
  --save-frequency 5000 --iterations-per-epoch 5000 \
  --long-save-frequency 10 --log-frequency 10 \
  --input-width 224 --input-height 224 \
  --use-videos --num-frames 4 --inter-batch-comparison \
  --compute-dtype bfloat16 \
  --distributed \
  --data-path ${DATA_PATH} "$@"
