"""Procedural datasets for tests, debugging, and benchmarking.

The reference debugs with tiny live configs (``*_debug.sh``); with zero egress
we go further: a procedural "video" dataset whose frames of the same video
share structure (a colored pattern + per-frame jitter), giving contrastive
training a learnable signal — used by integration tests ("loss decreases",
"kNN above chance") and by ``bench.py`` to drive the input pipeline at full
rate without disk.
"""

from typing import Dict, Optional

import numpy as np

from vince_tpu.data.base_dataset import BaseDataset


def _video_canvas(rng: np.random.RandomState, size: int) -> np.ndarray:
    """A synthetic 'scene': random low-frequency color field + shapes."""
    base = rng.randint(0, 256, (4, 4, 3), np.uint8)
    import cv2

    canvas = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    for _ in range(3):
        center = tuple(rng.randint(0, size, 2).tolist())
        radius = int(rng.randint(size // 8, size // 3))
        color = tuple(int(c) for c in rng.randint(0, 256, 3))
        cv2.circle(canvas, center, radius, color, -1)
    return canvas


class SyntheticVideoDataset(BaseDataset):
    """R2V2-shaped items: ``num_frames`` query/key frame pairs per video."""

    def __init__(self, args, data_subset: str = "train", num_videos: int = 512,
                 num_images_to_return: int = -1, seed: int = 0):
        super().__init__(args, data_subset)
        self.num_images_to_return = (
            num_images_to_return if num_images_to_return > 0 else args.num_frames
        )
        self.num_videos = num_videos
        self.seed = seed + (0 if data_subset == "train" else 10_000_000)

    def __len__(self):
        return self.num_videos

    def _frame(self, scene: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        """Per-frame camera jitter: small shift + brightness."""
        shift = rng.randint(-self.canvas // 16, self.canvas // 16 + 1, 2)
        frame = np.roll(scene, shift, axis=(0, 1))
        gain = rng.uniform(0.8, 1.2)
        return np.clip(frame.astype(np.float32) * gain, 0, 255).astype(np.uint8)

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        vid_rng = np.random.RandomState(self.seed + idx)
        scene = _video_canvas(vid_rng, self.canvas)
        if getattr(self.args, "repeatable", False):
            # per-item deterministic jitter (reference r2v2_dataset.py:57-61
            # repeatable mode) — loader threads race on the global RNG, so
            # determinism tests need draws keyed by idx, not draw order
            frame_rng = np.random.RandomState(self.seed + 7919 * (idx + 1))
        else:
            frame_rng = np.random.RandomState(np.random.randint(0, 2 ** 31))
        queries = [self._frame(scene, frame_rng) for _ in range(self.num_images_to_return)]
        keys = [self._frame(scene, frame_rng) for _ in range(self.num_images_to_return)]
        return {
            "data": np.stack(queries),
            "queue_data": np.stack(keys),
            "ind": np.int64(idx),
            "id": f"synth{idx:08d}",
        }


class SyntheticClipDataset(BaseDataset):
    """Kinetics-shaped labeled clips: [T] frames sharing a class-colored scene."""

    def __init__(self, args, data_subset: str = "train", num_clips: int = 256,
                 num_classes: int = 0, num_images_to_return: int = -1, seed: int = 0):
        super().__init__(args, data_subset)
        num_classes = num_classes or getattr(args, "end_task_classifier_num_classes", 0) or 4
        self.num_clips = num_clips
        self.num_classes = num_classes
        self.num_frames = (
            num_images_to_return if num_images_to_return > 0 else max(args.num_frames, 1)
        )
        self.seed = seed + (0 if data_subset == "train" else 10_000_000)
        rng = np.random.RandomState(321)
        self.class_colors = rng.randint(0, 256, (num_classes, 3), np.uint8)

    def __len__(self):
        return self.num_clips

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed + idx)
        label = int(idx % self.num_classes)
        base = np.ones((self.canvas, self.canvas, 3), np.uint8) * self.class_colors[label]
        frames = []
        for _ in range(self.num_frames):
            noise = rng.randint(-40, 41, base.shape).astype(np.int16)
            frames.append(np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8))
        return {
            "data": np.stack(frames),
            "labels": np.int32(label),
            "classifier_labels": np.int32(label),
            "ind": np.int64(idx),
        }


class SyntheticImageDataset(BaseDataset):
    """Labeled images where the label is recoverable from the dominant color —
    lets probe/classifier tests verify learning above chance."""

    def __init__(self, args, data_subset: str = "train", num_images: int = 512,
                 num_classes: int = 0, seed: int = 0):
        super().__init__(args, data_subset)
        num_classes = num_classes or getattr(args, "end_task_classifier_num_classes", 0) or 10
        self.num_views = max(getattr(args, "num_frames", 1), 1)
        self.num_images = num_images
        self.num_classes = num_classes
        self.seed = seed + (0 if data_subset == "train" else 10_000_000)
        rng = np.random.RandomState(123)
        self.class_colors = rng.randint(0, 256, (num_classes, 3), np.uint8)

    def __len__(self):
        return self.num_images

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + idx)
        label = int(idx % self.num_classes)
        img = np.ones((self.canvas, self.canvas, 3), np.uint8) * self.class_colors[label]
        noise = rng.randint(-40, 41, img.shape).astype(np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        reps = np.repeat(img[None], self.num_views, axis=0)
        return {
            "data": reps,
            "queue_data": reps,
            "labels": np.repeat(np.int32(label), self.num_views),
            "imagenet_labels": np.repeat(np.int32(label), self.num_views),
            "classifier_labels": np.repeat(np.int32(label), self.num_views),
            "ind": np.int64(idx),
        }

    def as_clip_item(self, idx, num_frames):
        """Kinetics-shaped item: [T, C, C, 3] frames + class label."""
        item = self[idx]
        return {
            "data": np.repeat(item["data"], num_frames, axis=0),
            "labels": item["labels"],
            "classifier_labels": item["labels"],
            "ind": np.int64(idx),
        }

    def as_npz_arrays(self):
        data = np.stack([self[i]["data"][0] for i in range(len(self))])
        labels = np.asarray([i % self.num_classes for i in range(len(self))], np.int32)
        return data, labels
