"""ImageFolder-style labeled image dataset (ImageNet, SUN-397 file lists).

Parity with reference ``datasets/imagenet_dataset.py`` (torchvision
ImageFolder + transform + optional subset, :9-17) and
``datasets/sun_scene_dataset.py`` (Training_01.txt/Testing_01.txt file lists →
{data, classifier_labels}, :37-76). Device-side augmentation replaces the
per-item transform; for VINCE multi-view training the step augments the same
canvas twice with independent rngs (RepeatedImagenetTransform semantics,
reference transforms.py:179-204).
"""

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from vince_tpu.data.base_dataset import BaseDataset


class ImagenetDataset(BaseDataset):
    """Class-per-directory layout: ``<root>/<split>/<wnid>/*.JPEG``."""

    def __init__(self, args, data_subset: str = "train", num_data_points: Optional[int] = None,
                 num_images_to_return: int = -1):
        super().__init__(args, data_subset)
        # multi-view parity: RepeatedImagenetTransform repeats each image per
        # frame slot (reference transforms.py:179-204, vince_solver.py:184-193
        # repeat_interleave); views diverge via independent device aug rngs
        self.num_views = (
            num_images_to_return if num_images_to_return > 0
            else max(getattr(args, "num_frames", 1), 1)
        )
        root = os.path.join(args.imagenet_data_path, data_subset)
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith((".jpg", ".jpeg", ".png")):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[c]))
        if num_data_points is not None and num_data_points < len(self.samples):
            rng = np.random.RandomState(0)
            keep = rng.choice(len(self.samples), num_data_points, replace=False)
            self.samples = [self.samples[i] for i in keep]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        path, label = self.samples[idx]
        img = self.read_image(path)
        if img is None:
            return None
        reps = np.repeat(img[None], self.num_views, axis=0)
        return {
            "data": reps,  # [num_views, C, C, 3]; views diverge on device
            "queue_data": reps,
            "labels": np.repeat(np.int32(label), self.num_views),
            "imagenet_labels": np.repeat(np.int32(label), self.num_views),
            "ind": np.int64(idx),
        }


class SunSceneDataset(BaseDataset):
    """SUN-397 from the official ``Training_01.txt``/``Testing_01.txt`` lists
    (reference sun_scene_dataset.py:37-56)."""

    def __init__(self, args, data_subset: str = "train"):
        super().__init__(args, data_subset)
        root = args.data_path
        list_file = "Training_01.txt" if data_subset == "train" else "Testing_01.txt"
        with open(os.path.join(root, list_file)) as f:
            rel_paths = [line.strip() for line in f if line.strip()]
        # class = full category path, e.g. /a/abbey/sun_xxx.jpg → /a/abbey
        class_names = sorted({os.path.dirname(p) for p in rel_paths})
        self.class_to_idx = {c: i for i, c in enumerate(class_names)}
        self.samples = [
            (os.path.join(root, p.lstrip(os.sep)), self.class_to_idx[os.path.dirname(p)])
            for p in rel_paths
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        path, label = self.samples[idx]
        img = self.read_image(path)
        if img is None:
            return None
        return {
            "data": img[None],
            "classifier_labels": np.int32(label),
            "labels": np.int32(label),
            "ind": np.int64(idx),
        }
