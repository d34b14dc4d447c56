"""Host-side dataset bases.

Capability parity with reference ``datasets/base_dataset.py`` (BaseDataset:
per-item RNG seeding :33-44, tolerant ``read_image`` :46-56) and
``base_multi_frame_dataset.py`` (VideoDataset: frame index built once by
globbing JPEGs, grouped video_id → [frame_ids], pickled as
``{split}_names.pkl`` :36-47; min-length filtering :20-24).

TPU-first division of labor: host datasets only decode + letterbox-resize to a
fixed uint8 canvas; all augmentation happens on device
(``vince_tpu.ops.augment``). The canvas is ``int(size/0.875)`` so the device
val path (resize/0.875 + center crop) and train RRC both have headroom.
"""

import abc
import glob
import os
import pickle
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def canvas_size(input_size: int) -> int:
    return int(input_size / 0.875)


class BaseDataset(abc.ABC):
    """Items are dicts of numpy arrays; images are uint8 [H, W, 3] RGB."""

    def __init__(self, args, data_subset: str = "train"):
        self.args = args
        self.data_subset = data_subset
        size = getattr(args, "input_width", 224)
        self.canvas = canvas_size(size)

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx) -> Optional[Dict[str, np.ndarray]]:
        raise NotImplementedError

    def read_image(self, path: str) -> Optional[np.ndarray]:
        """Tolerant JPEG read → RGB uint8 square canvas (reference
        base_dataset.py:46-56 returns None on failure; collate filters).

        With ``--native-decode`` (or VINCE_NATIVE_DECODE=1), JPEGs go through
        the C++ decoder (``vince_tpu/native``): DCT-domain scaled decode +
        fused resize, GIL released for the whole call so the loader's thread
        workers parallelize across cores. Non-JPEG / failed files fall back
        to the cv2 path below (which itself returns None on failure)."""
        if self._native_decode():
            from vince_tpu import native

            img = native.decode_jpeg_file(path, self.canvas)
            if img is not None:
                return img
        try:
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                return None
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            return self.resize_canvas(img)
        except Exception:
            return None

    def _native_decode(self) -> bool:
        want = getattr(self.args, "native_decode", False) or bool(
            int(os.environ.get("VINCE_NATIVE_DECODE", "0") or 0)
        )
        if not want:
            return False
        from vince_tpu import native

        return native.available()

    def resize_canvas(self, img: np.ndarray) -> np.ndarray:
        c = self.canvas
        if img.shape[0] != c or img.shape[1] != c:
            img = cv2.resize(img, (c, c), interpolation=cv2.INTER_LINEAR)
        return img


class VideoIndex:
    """video_id → sorted [frame_ids] index, built once from a glob and pickled
    (reference base_multi_frame_dataset.py:36-47)."""

    def __init__(
        self,
        data_path: str,
        data_subset: str,
        glob_pattern: str,
        parse_fn,  # path -> (video_id, frame_id)
        min_frames: int = 1,
        check_for_new_data: bool = False,
    ):
        self.data_split_path = os.path.join(data_path, data_subset)
        pickle_path = os.path.join(data_path, data_subset + "_names.pkl")
        if not os.path.exists(pickle_path) or check_for_new_data:
            paths = sorted(glob.iglob(os.path.join(self.data_split_path, glob_pattern)))
            grouped: Dict[str, List[int]] = {}
            for vid_id, ind in sorted(parse_fn(p) for p in paths):
                grouped.setdefault(vid_id, []).append(ind)
            path_info = sorted(grouped.items())
            os.makedirs(self.data_split_path, exist_ok=True)
            with open(pickle_path, "wb") as f:
                pickle.dump(path_info, f)
        with open(pickle_path, "rb") as f:
            path_info = pickle.load(f)
        # filter videos shorter than min_frames (base_multi_frame_dataset.py:20-24)
        self.path_info: List[Tuple[str, List[int]]] = [
            (k, v) for k, v in path_info if len(v) >= min_frames
        ]

    def __len__(self):
        return len(self.path_info)
