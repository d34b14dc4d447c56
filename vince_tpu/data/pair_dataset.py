"""SiamFC training-pair dataset.

Parity with reference ``siamfc_pytorch/pair_dataset.py``: pairs sampled <100
frames apart (:81-99), visibility/size/aspect acceptance filters (:101-126),
random horizontal flip of image+label (:58-76). Crops + response labels are
produced on host by ``SiamFCTransforms`` (single-warp); the device step only
normalizes.
"""

from typing import Dict, Optional

import numpy as np

from vince_tpu.data.base_dataset import BaseDataset
from vince_tpu.tracking.ops import read_image
from vince_tpu.tracking.siamfc_transforms import SiamFCTransforms


class PairDataset(BaseDataset):
    def __init__(self, args, seqs, data_subset: str = "train",
                 pair_transform: Optional[SiamFCTransforms] = None, pairs_per_seq: int = 25):
        super().__init__(args, data_subset)
        self.seqs = seqs
        self.pair_transform = pair_transform
        self.pairs_per_seq = pairs_per_seq
        self.indices = np.random.permutation(len(seqs))
        self.seq_sizes = {}
        self.invalid_seqs = {}

    def __len__(self):
        return len(self.indices) * self.pairs_per_seq

    def _filter(self, img0_path, key, anno):
        """Acceptance conditions c1–c7 (reference :101-126)."""
        if key in self.invalid_seqs:
            return self.invalid_seqs[key]
        if key not in self.seq_sizes:
            img = read_image(img0_path)
            self.seq_sizes[key] = img.shape[:2] if img is not None else (1, 1)
        size = self.seq_sizes[key]
        anno = np.atleast_2d(anno)
        areas = anno[:, 2] * anno[:, 3]
        c1 = areas >= 20
        c2 = np.all(anno[:, 2:] >= 20, axis=1)
        c3 = np.all(anno[:, 2:] <= 500, axis=1)
        # NOTE: (w, h) box sizes divided by (h, w) image size — the axis mix
        # is the reference's own behavior (pair_dataset.py:105 keeps
        # cv2 shape[:2] order); kept bug-for-bug for identical pair selection
        c4 = np.all((anno[:, 2:] / size) >= 0.01, axis=1)
        c5 = np.all((anno[:, 2:] / size) <= 0.5, axis=1)
        c6 = (anno[:, 2] / np.maximum(1, anno[:, 3])) >= 0.25
        c7 = (anno[:, 2] / np.maximum(1, anno[:, 3])) <= 4
        mask = np.logical_and.reduce((c1, c2, c3, c4, c5, c6, c7))
        val_indices = np.where(mask)[0]
        if len(val_indices) < 2:
            self.invalid_seqs[key] = val_indices
        return val_indices

    @staticmethod
    def _sample_pair(indices):
        n = len(indices)
        if n == 1:
            return indices[0], indices[0]
        if n == 2:
            return indices[0], indices[1]
        for _ in range(100):
            rand_z, rand_x = np.sort(np.random.choice(indices, 2, replace=False))
            if rand_x - rand_z < 100:
                return rand_z, rand_x
        rand_z = np.random.choice(indices)
        return rand_z, rand_z

    def __getitem__(self, index) -> Optional[Dict[str, np.ndarray]]:
        index = self.indices[index % len(self.indices)]
        img_files, anno = self.seqs[index][:2]
        val_indices = self._filter(img_files[0], int(index), anno)
        if len(val_indices) < 2:
            return self.__getitem__(int(np.random.randint(len(self))))
        rand_z, rand_x = self._sample_pair(val_indices)
        z = read_image(img_files[rand_z])
        x = read_image(img_files[rand_x])
        if z is None or x is None:
            return None
        exemplar_img, (track_img, label) = self.pair_transform(
            (z, x, anno[rand_z], anno[rand_x])
        )
        if self.data_subset == "train":
            if np.random.rand() > 0.5:
                exemplar_img = np.fliplr(exemplar_img).copy()
            if np.random.rand() > 0.5:
                track_img = np.fliplr(track_img).copy()
                label = np.fliplr(label).copy()
        return {
            "exemplar": exemplar_img.astype(np.uint8),
            "search": track_img.astype(np.uint8),
            "labels": label.astype(np.float32),
            "ind": np.int64(index),
        }
