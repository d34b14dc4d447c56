#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r50-b-896-q-65536 \
  --solver VinceSolver --backbone ResNet50 --dataset R2V2Dataset \
  --transform SimCLRTransform \
  --batch-size 896 --base-lr 0.105 \
  --vince-embedding-size 128 --vince-queue-size 65536 \
  --vince-momentum 0.999 --vince-temperature 0.2 \
  --epochs 200 \
  --save-frequency 1430 --iterations-per-epoch 1430 \
  --image-log-frequency 1430 --long-save-frequency 10 --log-frequency 10 \
  --input-width 224 --input-height 224 \
  --use-videos --num-frames 4 --inter-batch-comparison --self-batch-comparison \
  --compute-dtype bfloat16 \
  --data-path ${DATA_PATH} "$@"
