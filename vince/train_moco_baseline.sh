#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r18-moco-b-256-q-65536 \
  --solver VinceSolver --backbone ResNet18 \
  --transform MoCoV1ImagenetTransform \
  --batch-size 256 --base-lr 0.03 \
  --vince-queue-size 65536 --vince-momentum 0.999 --vince-temperature 0.07 \
  --save-frequency 1400 --iterations-per-epoch 1400 \
  --image-log-frequency 1400 --long-save-frequency 10 --log-frequency 10 \
  --input-width 224 --input-height 224 \
  --use-videos --num-frames 1 --dataset R2V2Dataset \
  --compute-dtype bfloat16 \
  --data-path ${DATA_PATH} "$@"
