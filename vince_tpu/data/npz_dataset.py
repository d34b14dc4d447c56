"""In-RAM NPZ tensor dataset — backs the CIFAR kNN probe.

Parity with reference ``datasets/npz_dataset.py``: load ``data``/``labels``
arrays, optional fixed-seed random subset, NCHW→NHWC normalization, resize to
the input size (:14-40). Used by the pretrain solver's fast in-training
quality regression signal (CIFAR kNN, reference vince_solver.py:651-693).
"""

from typing import Optional

import cv2
import numpy as np


class NPZDataset:
    def __init__(
        self,
        args,
        path: str,
        data_subset: str = "train",
        num_data_points: Optional[int] = None,
        target_size: Optional[tuple] = None,  # (w, h); default = args input size
    ):
        npz = np.load(path.format(data_subset=data_subset))
        data = npz["data"]
        labels = np.asarray(npz["labels"]).astype(np.int32)
        if num_data_points is not None and num_data_points < len(data):
            rng = np.random.RandomState(0)  # fixed seed, npz_dataset.py:25
            keep = rng.choice(len(data), num_data_points, replace=False)
            data, labels = data[keep], labels[keep]
        assert data.ndim == 4
        if data.shape[1] == 3 and data.shape[-1] != 3:
            data = data.transpose(0, 2, 3, 1)
        size = target_size or (
            getattr(args, "input_width", 224), getattr(args, "input_height", 224)
        )
        if data.shape[1:3] != (size[1], size[0]):
            data = np.stack(
                [cv2.resize(im, size, interpolation=cv2.INTER_LINEAR) for im in data]
            )
        self.data = np.ascontiguousarray(data.astype(np.uint8))
        self.labels = labels
        self.batch_size = getattr(args, "batch_size", 256)

    def __len__(self):
        return len(self.data)

    def iter_batches(self, batch_size: Optional[int] = None, pad_to_batch: bool = True):
        """Sequential [B, H, W, 3] uint8 batches (+labels). The final partial
        batch is zero-padded with a valid-count so jitted shapes stay static."""
        b = batch_size or self.batch_size
        n = len(self.data)
        for off in range(0, n, b):
            chunk = self.data[off : off + b]
            labels = self.labels[off : off + b]
            valid = len(chunk)
            if valid < b and pad_to_batch:
                pad = b - valid
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)])
                labels = np.concatenate([labels, np.zeros((pad,), np.int32)])
            yield chunk, labels, valid


class NPZImageDataset:
    """Trainable image dataset over an NPZ file — the "single-frame MoCo on
    CIFAR" CPU-runnable debug config (BASELINE.json configs[0]): items are
    {data, queue_data} views of one image (augmented differently on device)
    plus class labels, so the same file drives both MoCo pretraining and the
    kNN probe. Path template comes from ``--cifar-data-path`` (or
    ``--data-path`` if it ends in .npz)."""

    def __init__(self, args, data_subset: str = "train", num_data_points=None):
        from vince_tpu.data.base_dataset import canvas_size

        path = getattr(args, "data_path", "") or ""
        if not path.endswith(".npz"):
            path = args.cifar_data_path
        # reference probe files use the {train, val} subset naming
        subset = {"test": "val"}.get(data_subset, data_subset)
        c = canvas_size(getattr(args, "input_width", 224))
        inner = NPZDataset(args, path, subset, num_data_points, target_size=(c, c))
        self.data = inner.data
        self.labels = inner.labels
        self.num_views = max(getattr(args, "num_frames", 1), 1)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        img = self.data[idx]
        reps = np.repeat(img[None], self.num_views, axis=0)
        label = np.repeat(np.int32(self.labels[idx]), self.num_views)
        return {
            "data": reps,
            "queue_data": reps,
            "labels": label,
            "imagenet_labels": label,
            "classifier_labels": label,
            "ind": np.int64(idx),
        }
