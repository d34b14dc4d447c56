"""R2V2 video-frame pair dataset.

Parity with reference ``datasets/r2v2_dataset.py``: frame files laid out as
``AA/AA2pFq9pFTA_000001.jpg`` (2-char shard dirs, :14-34); per-item RNG seed
with a ``repeatable`` mode (:57-61); each item samples ``num_frames`` *pairs of
frames (with replacement) from one video* — first of each pair → ``data``
(query), second → ``queue_data`` (key) (:70-88); ``--no-multi-frame``
restricts all pairs to one frame (:63-64). Augmentation (the reference applies
``transform`` here) happens on device; ``shared_transform`` becomes a flag the
train step consumes (same aug rng for query & key).

``GOT10KR2V2Dataset`` variant: folder-per-video naming ``<vid>/%08d.jpg``
(reference :102-111).
"""

import os
from typing import Dict, Optional

import numpy as np

from vince_tpu.data.base_dataset import BaseDataset, VideoIndex

_LEN_NUM = 6  # frame id zero-pad width, reference r2v2_dataset.py:14-18


class R2V2Dataset(BaseDataset):
    glob_pattern = "*/*.jpg"

    @staticmethod
    def parse_path(path: str):
        name = os.path.basename(path)  # AA2pFq9pFTA_000001.jpg
        stem = name[: -len(".jpg")]
        vid, frame = stem.rsplit("_", 1)
        return vid, int(frame)

    def frame_path(self, vid: str, ind: int) -> str:
        return os.path.join(self.index.data_split_path, vid[:2], f"{vid}_{ind:06d}.jpg")

    def __init__(
        self,
        args,
        data_subset: str = "train",
        num_images_to_return: int = -1,
        shared_transform: bool = False,
        repeatable: bool = False,
        check_for_new_data: bool = False,
    ):
        super().__init__(args, data_subset)
        self.num_images_to_return = (
            num_images_to_return if num_images_to_return > 0 else args.num_frames
        )
        self.multi_frame = getattr(args, "multi_frame", True)
        self.shared_transform = shared_transform
        self.repeatable = repeatable
        self.index = VideoIndex(
            args.data_path,
            data_subset,
            self.glob_pattern,
            self.parse_path,
            min_frames=self.num_images_to_return,
            check_for_new_data=check_for_new_data,
        )

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        vid, frame_ids = self.index.path_info[idx]
        seed = idx if self.repeatable else np.random.randint(0, 2 ** 31)
        rng = np.random.RandomState(seed)

        if not self.multi_frame:
            frame_ids = rng.choice(frame_ids, 1)

        cache: Dict[int, np.ndarray] = {}
        queries, keys = [], []
        for _ in range(self.num_images_to_return):
            pair = rng.choice(frame_ids, 2, replace=True)
            for side, ind in enumerate(pair):
                if ind not in cache:
                    img = self.read_image(self.frame_path(vid, int(ind)))
                    if img is None:
                        return None
                    cache[ind] = img
                (queries if side == 0 else keys).append(cache[ind])

        return {
            "data": np.stack(queries),  # [num_frames, C, C, 3] uint8
            "queue_data": np.stack(keys),
            "ind": np.int64(idx),
            "id": vid,
        }


class GOT10KR2V2Dataset(R2V2Dataset):
    glob_pattern = "*/*.jpg"

    @staticmethod
    def parse_path(path: str):
        parts = path.split(os.sep)
        return parts[-2], int(os.path.splitext(parts[-1])[0]) - 1

    def frame_path(self, vid: str, ind: int) -> str:
        return os.path.join(self.index.data_split_path, vid, f"{ind + 1:08d}.jpg")
