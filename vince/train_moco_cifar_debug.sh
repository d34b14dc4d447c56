#!/usr/bin/env bash
# Single-frame MoCo ResNet18 on CIFAR NPZ files — the CPU-runnable debug
# config (BASELINE.json configs[0]). Build the NPZs once with
# tools/make_cifar_npz.py; the same files feed training and the kNN probe.
set -e
if [ -z "${CIFAR_PATH:-}" ]; then CIFAR_PATH='datasets/cifar_data/cifar_{data_subset}.npz'; fi
PLATFORM="${PLATFORM:-cpu}"
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

python solver_runner.py \
  --title moco_cifar --description debug-r18-cifar \
  --solver VinceSolver --backbone ResNet18 --dataset NPZImageDataset \
  --transform MoCoV1ImagenetTransform \
  --batch-size 64 --base-lr 0.03 \
  --vince-embedding-size 64 --vince-queue-size 4096 \
  --input-width 32 --input-height 32 --num-frames 1 \
  --iterations-per-epoch 100 --epochs 5 \
  --cifar-data-path "${CIFAR_PATH}" --mesh-data-size 4 --mesh-queue-size 2 \
  --no-save --debug --platform ${PLATFORM} "$@"
