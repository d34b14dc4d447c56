"""Average meters — replaces ``dg_util.average_meter`` (SURVEY.md §2.9;
used by reference ``solvers/base_solver.py:131-149``)."""

import collections
from typing import Deque, Optional


class AverageMeter:
    """Running mean over all updates since ``reset``."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def value(self) -> float:
        return self.sum / max(self.count, 1)


class RollingAverageMeter:
    """Mean over the last ``window`` updates (reference uses these for per-phase
    wall-clock timing, ``base_solver.py:133-141``)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.values: Deque[float] = collections.deque(maxlen=window)

    def reset(self):
        self.values.clear()

    def update(self, value: float):
        self.values.append(float(value))

    @property
    def value(self) -> float:
        return sum(self.values) / max(len(self.values), 1)


class Stopwatch:
    """Phase timer used to populate the reference's total/data/forward/metrics/
    backward time meters (``vince_solver.py:387-393,459-472``)."""

    def __init__(self):
        import time

        self._time = time
        self._t: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t = self._time.perf_counter()
        self._t0 = self._t
        return self

    def lap(self) -> float:
        now = self._time.perf_counter()
        dt = now - (self._t if self._t is not None else now)
        self._t = now
        return dt

    def total(self) -> float:
        """Wall time since start() — the sum of all laps plus any un-lapped
        remainder; the truthful total_time bucket."""
        now = self._time.perf_counter()
        return now - (self._t0 if self._t0 is not None else now)
