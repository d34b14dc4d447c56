#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince_debug --base-logdir ${BASE_LOG_LOCATION} \
  --description debug --debug --no-save --no-restore \
  --solver VinceSolver --backbone ResNet18 --dataset SyntheticVideoDataset \
  --transform StandardVideoTransform \
  --batch-size 32 --base-lr 0.03 \
  --vince-embedding-size 64 --vince-queue-size 256 \
  --epochs 2 --iterations-per-epoch 10 \
  --input-width 64 --input-height 64 \
  --use-videos --num-frames 2 --inter-batch-comparison "$@"
