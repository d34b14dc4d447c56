#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince_debug --base-logdir ${BASE_LOG_LOCATION} \
  --description debug --debug --no-save --no-restore \
  --solver EndTaskKinetics400Solver --backbone ResNet18 --dataset SyntheticClipDataset \
  --batch-size 16 --num-frames 4 --base-lr 0.01 --epochs 1 --iterations-per-epoch 5 \
  --input-width 64 --input-height 64 \
  --end-task-classifier-num-classes 4 --freeze-feature-extractor "$@"
