#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r18-b-256-q-65536 \
  --solver EndTaskImagenetSolver --backbone ResNet18 --dataset ImagenetDataset \
  --lr-decay-type step --lr-step-schedule 60 80 --epochs 100 \
  --batch-size 256 --base-lr 30.0 \
  --image-log-frequency 10000 --save-frequency 2500 --long-save-frequency 25 \
  --log-frequency 10 --input-width 224 --input-height 224 \
  --end-task-classifier-num-classes 1000 --freeze-feature-extractor \
  --imagenet-data-path ${IMAGENET_PATH} "$@"
