#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince --base-logdir ${BASE_LOG_LOCATION} \
  --description r18-b-256-q-65536 \
  --solver EndTaskSunSceneSolver --backbone ResNet18 --dataset SunSceneDataset \
  --epochs 2000 --batch-size 256 --base-lr 0.01 \
  --end-task-classifier-num-classes 397 --freeze-feature-extractor \
  --input-width 224 --input-height 224 \
  --data-path ${DATA_PATH} "$@"
