"""Host-side tracking image ops.

Replaces the ``dg_util.image_util.get_cropped_input`` single-warp crop the
reference leans on (``siamfc_pytorch/ops.py:108-118``, SURVEY.md §2.9): one
``cv2.warpAffine`` maps an arbitrary (possibly out-of-bounds) square crop to
the output size with mean-color padding — no intermediate padded image.
"""

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


def get_cropped_input(
    image: np.ndarray,
    xyxy: Sequence[float],
    padding_scale: float = 1.0,
    out_size: int = 255,
    interpolation: int = cv2.INTER_LINEAR,
    pad_color: Optional[Sequence[float]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop ``xyxy`` (scaled about its center by ``padding_scale``) and resize
    to (out_size, out_size) in a single warp. Returns (crop, affine_matrix)."""
    x1, y1, x2, y2 = [float(v) for v in xyxy]
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    w, h = (x2 - x1) * padding_scale, (y2 - y1) * padding_scale
    w = max(w, 1e-3)
    h = max(h, 1e-3)
    sx = out_size / w
    sy = out_size / h
    # affine: out = s * (in - center) + out_size/2
    m = np.array(
        [[sx, 0.0, out_size / 2.0 - cx * sx], [0.0, sy, out_size / 2.0 - cy * sy]],
        dtype=np.float32,
    )
    if pad_color is None:
        pad_color = image.mean(axis=(0, 1))
    crop = cv2.warpAffine(
        image,
        m,
        (int(out_size), int(out_size)),
        flags=interpolation,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=tuple(float(c) for c in np.atleast_1d(pad_color)),
    )
    return crop, m


def read_image(path: str) -> Optional[np.ndarray]:
    """Robust RGB read (reference siamfc_pytorch/ops.py:24-36)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def xywh_to_xyxy(box: np.ndarray) -> np.ndarray:
    """[x, y, w, h] → [x1, y1, x2, y2] (dg_util.bb_util parity)."""
    box = np.asarray(box, np.float32)
    return np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]], np.float32)


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-12)
