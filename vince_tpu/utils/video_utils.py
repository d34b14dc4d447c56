"""Video frame extraction + filter cascade.

Replaces the ``dg_util.video_utils`` surface used by the data-production
pipeline (SURVEY.md §2.9 / reference ``datasets/video_cacher_dataset.py:93-188``):
``get_frames``, ``filter_similar_frames``, ``filter_using_laplacian``,
``filter_using_flow``, ``remove_border``, ``get_shots``, and the
``misc_util.max_resize/min_resize`` helpers. dg_util is not vendored in the
reference, so thresholds here are chosen to reproduce the *behavioral* contract
(drop near-duplicate, blurry, static, and letterboxed frames).
"""

from typing import List, Optional, Sequence

import cv2
import numpy as np


def max_resize(image: np.ndarray, max_side: int, always_resize: bool = False) -> np.ndarray:
    h, w = image.shape[:2]
    if max(h, w) <= max_side and not always_resize:
        return image
    scale = max_side / max(h, w)
    return cv2.resize(image, (int(round(w * scale)), int(round(h * scale))))


def min_resize(image: np.ndarray, min_side: int, always_resize: bool = False) -> np.ndarray:
    h, w = image.shape[:2]
    if min(h, w) >= min_side and not always_resize:
        return image
    scale = min_side / min(h, w)
    return cv2.resize(image, (int(round(w * scale)), int(round(h * scale))))


def get_frames(
    video_path: str,
    sample_rate: int = 5,
    max_frames: int = -1,
    remove_video: bool = False,
    return_inds: bool = False,
    fps: Optional[float] = None,
):
    """Decode every ``sample_rate``-th frame (RGB)."""
    cap = cv2.VideoCapture(video_path)
    frames, inds = [], []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % max(sample_rate, 1) == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            inds.append(idx)
            if 0 < max_frames * 4 <= len(frames):
                break  # decode headroom for downstream filtering
        idx += 1
    cap.release()
    if remove_video:
        import os

        os.remove(video_path)
    if not frames:
        return (None, None) if return_inds else None
    if return_inds:
        return frames, np.asarray(inds)
    return frames


def get_frames_by_time(video_path: str, times_s: Sequence[float]):
    """Seek-decode frames at given timestamps (reference recreate pipeline)."""
    cap = cv2.VideoCapture(video_path)
    out = []
    for t in times_s:
        cap.set(cv2.CAP_PROP_POS_MSEC, t * 1000.0)
        ok, frame = cap.read()
        out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if ok else None)
    cap.release()
    return out


def _gray_small(frame: np.ndarray, size: int = 64) -> np.ndarray:
    g = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
    return cv2.resize(g, (size, size)).astype(np.float32)


def filter_similar_frames(
    frames: List[np.ndarray], threshold: float = 10.0, return_inds: bool = False
):
    """Drop frames nearly identical to the last kept frame (mean abs-diff on a
    64² gray thumbnail below ``threshold``)."""
    keep = [0]
    last = _gray_small(frames[0])
    for i in range(1, len(frames)):
        g = _gray_small(frames[i])
        if np.mean(np.abs(g - last)) >= threshold:
            keep.append(i)
            last = g
    kept = [frames[i] for i in keep]
    if return_inds:
        return kept, np.asarray(keep)
    return kept


def filter_using_laplacian(
    frames: np.ndarray, threshold: float = 100.0, return_inds: bool = False
):
    """Drop blurry frames: variance of the Laplacian below ``threshold``."""
    keep = []
    for i, frame in enumerate(frames):
        g = cv2.cvtColor(np.asarray(frame), cv2.COLOR_RGB2GRAY)
        if cv2.Laplacian(g, cv2.CV_32F).var() >= threshold:
            keep.append(i)
    kept = np.asarray(frames)[keep] if len(keep) else np.zeros((0,) + np.asarray(frames).shape[1:], np.uint8)
    if return_inds:
        return kept, np.asarray(keep, np.int64)
    return kept


def filter_using_flow(
    prev_frames: np.ndarray,
    frames: np.ndarray,
    min_flow: float = 0.5,
    max_flow: float = 50.0,
    return_inds: bool = False,
):
    """Drop static or cut-jump frames by mean Farneback flow magnitude."""
    keep, masks = [], []
    for i in range(len(frames)):
        a = _gray_small(np.asarray(prev_frames[i]), 128)
        b = _gray_small(np.asarray(frames[i]), 128)
        flow = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        mag = np.linalg.norm(flow, axis=-1)
        mean_mag = float(mag.mean())
        if min_flow <= mean_mag <= max_flow:
            keep.append(i)
            masks.append(mag > mag.mean())
    kept = np.asarray(frames)[keep] if keep else np.zeros((0,) + np.asarray(frames).shape[1:], np.uint8)
    masks = np.asarray(masks) if masks else np.zeros((0, 128, 128), bool)
    if return_inds:
        return kept, masks, np.asarray(keep, np.int64)
    return kept, masks


def remove_border(frames: List[np.ndarray], threshold: int = 16, return_inds: bool = False):
    """Crop constant (letterbox) borders common to all frames. Returns cropped
    frames (+ (x1, x2, y1, y2) when return_inds)."""
    stack = np.stack([_gray_small(np.asarray(f), 256) for f in frames])
    energy = stack.std(axis=0) + stack.mean(axis=0)
    col_live = np.where(energy.max(axis=0) > threshold)[0]
    row_live = np.where(energy.max(axis=1) > threshold)[0]
    h, w = np.asarray(frames[0]).shape[:2]
    if len(col_live) == 0 or len(row_live) == 0:
        x1 = x2 = y1 = y2 = 0
    else:
        x1 = int(col_live[0] / 256 * w)
        x2 = int((col_live[-1] + 1) / 256 * w)
        y1 = int(row_live[0] / 256 * h)
        y2 = int((row_live[-1] + 1) / 256 * h)
    cropped = [np.asarray(f)[y1:y2, x1:x2] for f in frames]
    if return_inds:
        return cropped, (x1, x2, y1, y2)
    return cropped


def get_shots(frames: np.ndarray, threshold: float = 40.0, return_inds: bool = False):
    """Histogram-difference shot segmentation → list of frame runs."""
    borders = [0]
    prev_hist = None
    for i, frame in enumerate(frames):
        hist = cv2.calcHist([np.asarray(frame)], [0, 1, 2], None, [8, 8, 8],
                            [0, 256] * 3).flatten()
        hist = hist / max(hist.sum(), 1)
        if prev_hist is not None and np.abs(hist - prev_hist).sum() * 100 > threshold:
            borders.append(i)
        prev_hist = hist
    borders.append(len(frames))
    shots = [np.asarray(frames)[borders[i]: borders[i + 1]] for i in range(len(borders) - 1)]
    if return_inds:
        return shots, borders
    return shots
