#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r18-b-256-q-65536-jigsaw \
  --solver VinceSolver --backbone ResNet18 --dataset R2V2Dataset \
  --transform JigsawTransform --jigsaw \
  --batch-size 256 --base-lr 0.03 \
  --vince-queue-size 65536 --vince-momentum 0.999 --vince-temperature 0.07 \
  --epochs 200 \
  --save-frequency 5000 --iterations-per-epoch 5000 \
  --image-log-frequency 5000 --long-save-frequency 10 --log-frequency 10 \
  --input-width 225 --input-height 225 \
  --use-videos --num-frames 4 --inter-batch-comparison \
  --compute-dtype bfloat16 \
  --data-path ${DATA_PATH} "$@"
