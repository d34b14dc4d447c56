#!/usr/bin/env python
"""Build the CIFAR kNN-probe NPZ files.

The reference ships ``datasets/cifar_data/cifar_{train,test}.npz`` as git-lfs
pointers (SURVEY.md §4); this tool recreates them from a standard
``cifar-10-batches-py`` directory (the python-pickle distribution of CIFAR-10):

    python tools/make_cifar_npz.py --cifar-dir /path/to/cifar-10-batches-py \
        --output-dir datasets/cifar_data
"""

import argparse
import os
import pickle

import numpy as np


def _load_batch(path):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC uint8
    labels = np.asarray(d[b"labels"], np.int32)
    return data, labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cifar-dir", required=True)
    parser.add_argument("--output-dir", default=os.path.join("datasets", "cifar_data"))
    args = parser.parse_args()

    train_data, train_labels = [], []
    for i in range(1, 6):
        d, l = _load_batch(os.path.join(args.cifar_dir, f"data_batch_{i}"))
        train_data.append(d)
        train_labels.append(l)
    test_data, test_labels = _load_batch(os.path.join(args.cifar_dir, "test_batch"))

    os.makedirs(args.output_dir, exist_ok=True)
    np.savez(
        os.path.join(args.output_dir, "cifar_train.npz"),
        data=np.concatenate(train_data), labels=np.concatenate(train_labels),
    )
    np.savez(
        os.path.join(args.output_dir, "cifar_test.npz"),
        data=test_data, labels=test_labels,
    )
    print("wrote cifar_train.npz / cifar_test.npz to", args.output_dir)


if __name__ == "__main__":
    main()
