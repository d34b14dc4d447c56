#!/usr/bin/env bash
# TPU-native launch config (reference GPU-id flags become mesh flags).
set -e
BASE_LOG_LOCATION="${BASE_LOG_LOCATION:-logs}"
DATA_PATH="${DATA_PATH:-}"
IMAGENET_PATH="${IMAGENET_PATH:-}"

python solver_runner.py \
  --title moco_v2 --base-logdir ${BASE_LOG_LOCATION} \
  --description r50-moco-v2-b-256-e-128-q-65536 \
  --solver VinceSolver --backbone ResNet50 \
  --transform MoCoV2ImagenetTransform \
  --batch-size 256 --base-lr 0.03 \
  --vince-embedding-size 128 --vince-queue-size 65536 \
  --vince-momentum 0.999 --vince-temperature 0.2 \
  --epochs 200 --lr-decay-type cos \
  --save-frequency 5005 --iterations-per-epoch 5005 \
  --image-log-frequency 5005 --long-save-frequency 10 --log-frequency 10 \
  --input-width 224 --input-height 224 --num-frames 1 \
  --use-imagenet --imagenet-data-path ${IMAGENET_PATH} \
  --compute-dtype bfloat16 "$@"
