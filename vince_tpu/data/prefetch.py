"""Background batch-staging prefetch (reference ``vince_solver.py:340-374``).

The reference runs a prefetch thread that stages loader batches onto the
accelerator (``val.to(device)``) into a bounded ``Queue(2)`` ahead of the
train loop. Same design here, shared by the pretrain and end-task solvers:
the thread overlaps host collate + H2D transfer of batch N+1 with the device
computing step N (JAX dispatch is async; ``device_put`` is thread-safe).
Depth 2 bounds the extra HBM to two staged batches.
"""

import multiprocessing as mp
import queue as queue_lib
import threading
from typing import Callable, Optional


def pull_with_kill(loader, should_stop: Optional[Callable[[], bool]],
                   timeout: float = 0.5):
    """``loader.get_batch`` in bounded waits, polling a kill predicate between
    them so shutdown never hangs on a slow/stopped loader. Returns None when
    killed."""
    while True:
        if should_stop is not None and should_stop():
            return None
        try:
            return loader.get_batch(timeout=timeout)
        except (queue_lib.Empty, mp.TimeoutError):
            continue


class BatchPrefetcher:
    """Runs ``stage_fn(should_stop)`` on a daemon thread into a bounded queue.

    ``stage_fn`` pulls host batch(es) and moves them to the device mesh; it
    must poll ``should_stop()`` between bounded waits (``pull_with_kill``) and
    return None when stopped — a None return ends the thread.
    """

    def __init__(self, stage_fn: Callable, depth: int = 2):
        self._stage_fn = stage_fn
        self._queue: queue_lib.Queue = queue_lib.Queue(maxsize=depth)
        self._kill = False
        self._thread: Optional[threading.Thread] = None

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def start(self) -> "BatchPrefetcher":
        if self._thread is None:
            self._kill = False
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def _loop(self):
        bq = self._queue  # local ref: survives stop() swapping the field
        while not self._kill:
            staged = self._stage_fn(lambda: self._kill)
            if staged is None:
                return
            while not self._kill:
                try:
                    bq.put(staged, timeout=0.5)
                    break
                except queue_lib.Full:
                    continue

    def get(self, timeout: float = 5.0):
        while True:
            try:
                return self._queue.get(timeout=timeout)
            except queue_lib.Empty:
                if not self.running:
                    raise RuntimeError(
                        "batch prefetch thread died; see traceback above"
                    ) from None

    def stop(self):
        self._kill = True
        thread, self._thread = self._thread, None
        if thread is not None:
            thread.join(timeout=10.0)
