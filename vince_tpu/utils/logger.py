"""Metric/image logger — replaces ``dg_util.tensorboard_logger.Logger``
(SURVEY.md §2.9): ``scalar_summary``, ``dict_log``, ``image_summary``,
``network_conv_summary`` (weight histograms, reference ``base_solver.py:153``).

Backed by tensorboardX when available; falls back to an in-memory recorder so
tests and headless runs never need the dependency.
"""

from typing import Dict, Optional

import numpy as np

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


class Logger:
    def __init__(self, logdir: Optional[str] = None):
        self.logdir = logdir
        self.writer = SummaryWriter(logdir) if (logdir and SummaryWriter) else None
        self.history: Dict[str, list] = {}

    def scalar_summary(self, tag: str, value: float, step: int):
        value = float(value)
        self.history.setdefault(tag, []).append((step, value))
        if self.writer:
            self.writer.add_scalar(tag, value, step)

    def dict_log(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        for k, v in scalars.items():
            tag = f"{prefix}{k}" if prefix else k
            try:
                self.scalar_summary(tag, float(np.asarray(v)), step)
            except (TypeError, ValueError):
                pass

    def image_summary(self, tag: str, image: np.ndarray, step: int, max_size: int = 2048):
        """image: HWC uint8."""
        image = np.asarray(image)
        if max(image.shape[:2]) > max_size:
            scale = max_size / max(image.shape[:2])
            import cv2

            image = cv2.resize(image, (int(image.shape[1] * scale), int(image.shape[0] * scale)))
        if self.writer:
            self.writer.add_image(tag, image, step, dataformats="HWC")

    def histogram_summary(self, tag: str, values: np.ndarray, step: int):
        if self.writer:
            self.writer.add_histogram(tag, np.asarray(values), step)

    def network_weight_summary(self, params, step: int, prefix: str = "weights"):
        """Per-epoch weight histograms (reference ``base_solver.py:153``)."""
        if not self.writer:
            return
        from vince_tpu.utils.pytree import flatten_dict, to_numpy

        for name, leaf in flatten_dict(params).items():
            arr = to_numpy(leaf)
            if arr.size > 0:
                self.histogram_summary(f"{prefix}/{name}", arr.reshape(-1), step)

    def flush(self):
        if self.writer:
            self.writer.flush()

    def close(self):
        if self.writer:
            self.writer.close()
