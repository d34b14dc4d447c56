#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title vince_debug --base-logdir ${BASE_LOG_LOCATION} \
  --description debug --debug --no-save --no-restore \
  --solver EndTaskTrackingSolver --backbone ResNet18SiamFCDilated --dataset GOT10kDataset \
  --batch-size 8 --base-lr 0.01 --epochs 1 --iterations-per-epoch 5 \
  --input-width 120 --input-height 120 \
  --freeze-feature-extractor "$@"
