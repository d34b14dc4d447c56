#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince_debug --base-logdir ${BASE_LOG_LOCATION} \
  --description debug --debug --no-save --no-restore \
  --solver EndTaskSunSceneSolver --backbone ResNet18 --dataset SyntheticImageDataset \
  --batch-size 32 --base-lr 0.05 --epochs 1 --iterations-per-epoch 10 \
  --input-width 64 --input-height 64 \
  --end-task-classifier-num-classes 10 --freeze-feature-extractor "$@"
