"""Kinetics-400 frame-cache dataset.

Parity with reference ``datasets/kinetics_400_dataset.py``: same 2-char-shard
frame layout as R2V2 (:24-36), label map built once from the annotation JSON
and pickled (:56-68), items sample a **contiguous** ``num_frames`` window
(:73-92). The reference's one-shared-augmentation-per-clip is applied on
device (``augment_batch(group_size=T)``).

Frame ids in the cache start at 0 and are contiguous per clip.
"""

import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

from vince_tpu.data.base_dataset import BaseDataset, VideoIndex


class Kinetics400Dataset(BaseDataset):
    @staticmethod
    def parse_path(path: str):
        name = os.path.basename(path)
        stem = name[: -len(".jpg")]
        vid, frame = stem.rsplit("_", 1)
        return vid, int(frame)

    def frame_path(self, vid: str, ind: int) -> str:
        return os.path.join(self.index.data_split_path, vid[:2], f"{vid}_{ind:06d}.jpg")

    def __init__(self, args, data_subset: str = "train", num_images_to_return: int = -1,
                 check_for_new_data: bool = False):
        super().__init__(args, data_subset)
        self.num_images_to_return = (
            num_images_to_return if num_images_to_return > 0 else args.num_frames
        )
        self.index = VideoIndex(
            args.data_path, data_subset, "*/*.jpg", self.parse_path,
            min_frames=self.num_images_to_return,
            check_for_new_data=check_for_new_data,
        )
        ann_dir = os.path.join(args.data_path, "annotations")
        pickle_path = os.path.join(ann_dir, data_subset + ".pkl")
        if not os.path.exists(pickle_path) or check_for_new_data:
            with open(os.path.join(ann_dir, data_subset + ".json")) as f:
                raw = json.load(f)
            annotations = {k: v["annotations"]["label"] for k, v in raw.items()}
            class_names = sorted(set(annotations.values()))
            name_to_ind = {n: i for i, n in enumerate(class_names)}
            annotations = {k: name_to_ind[v] for k, v in annotations.items()}
            with open(pickle_path, "wb") as f:
                pickle.dump(annotations, f)
        with open(pickle_path, "rb") as f:
            self.annotations = pickle.load(f)

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        vid, frame_ids = self.index.path_info[idx]
        t = self.num_images_to_return
        start = np.random.randint(0, len(frame_ids) - t + 1)
        images = []
        for offset in range(start, start + t):
            img = self.read_image(self.frame_path(vid, int(frame_ids[offset])))
            if img is None:
                return None
            images.append(img)
        return {
            "data": np.stack(images),  # [T, C, C, 3]
            "labels": np.int32(self.annotations[vid]),
            "classifier_labels": np.int32(self.annotations[vid]),
            "ind": np.int64(idx),
        }
