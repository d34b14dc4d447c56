"""Host input pipeline: persistent thread-pool loader with device prefetch.

Replaces the reference's ``PersistentDataLoader`` + prefetch-thread machinery
(SURVEY.md §2.9 and ``vince_solver.py:48-49,340-374``): a worker pool that can
be created *before* the dataset (``set_dataset`` later), ``never_ending``
iterators that never raise StopIteration, a bounded prefetch queue (depth 2,
matching the reference's Queue(2)), and None-item tolerance (failed reads are
resampled — the reference's collate drops Nones).

TPU-first: workers only decode/resize uint8 canvases (cheap); batches are
assembled as stacked numpy and (optionally) ``jax.device_put`` with the target
sharding so the next step's H2D copy overlaps compute — augmentation itself is
on-device. Threads (not processes) suffice because cv2 JPEG decode releases
the GIL.
"""

import multiprocessing as mp
import queue
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

# Worker-process globals (fork initializer)
_WORKER_DATASET = None
_WORKER_COLLATE = None


def _proc_init(dataset, collate_fn, seed):
    global _WORKER_DATASET, _WORKER_COLLATE
    try:
        import cv2

        cv2.setNumThreads(0)  # one decode per process; no nested pools
    except ImportError:
        pass
    _WORKER_DATASET = dataset
    _WORKER_COLLATE = collate_fn
    np.random.seed(seed + mp.current_process().pid % 100000)


def _proc_load(indices):
    items = []
    for i in indices:
        item = _WORKER_DATASET[i]
        tries = 0
        while item is None and tries < 10:
            item = _WORKER_DATASET[int(np.random.randint(len(_WORKER_DATASET)))]
            tries += 1
        if item is not None:
            items.append(item)
    if not items:
        return None
    while len(items) < len(indices):
        items.append(items[len(items) % max(len(items), 1)])
    return _WORKER_COLLATE(items)


def collate_video_batch(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-video dicts and flatten [V, F, ...] → [V*F, ...] for the
    frame-major batch layout the train step expects (reference
    BatchConcatDataset.collate_fn, base_dataset.py:64-102)."""
    out: Dict[str, Any] = {}
    keys = items[0].keys()
    for k in keys:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) and vals[0].ndim >= 4:
            # [F, H, W, C] per item → [V*F, H, W, C] frame-major batch
            stacked = np.stack(vals)
            out[k] = stacked.reshape((-1,) + stacked.shape[2:])
        elif isinstance(vals[0], np.ndarray) and vals[0].ndim >= 2:
            # single image / label map per item → plain stack
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (np.integer, int, np.floating, float, np.ndarray)):
            out[k] = np.stack([np.asarray(v) for v in vals]).reshape(-1)
        else:
            out[k] = list(vals)
    return out


class PersistentDataLoader:
    """Thread-pool loader over an index-style dataset."""

    def __init__(
        self,
        dataset=None,
        batch_size: int = 1,  # number of dataset ITEMS per batch (videos)
        num_workers: int = 8,
        shuffle: bool = True,
        never_ending: bool = True,
        collate_fn: Callable = collate_video_batch,
        prefetch: int = 2,
        seed: int = 0,
        device_put_fn: Optional[Callable] = None,
        use_processes: bool = False,  # fork-pool workers: true parallel JPEG
        # decode (threads are GIL-bound at ~400 frames/s; the reference's
        # PersistentDataLoader is process-based for the same reason)
        num_shards: int = 1,  # multi-host: iterate only indices
        shard_id: int = 0,  # [shard_id::num_shards] of each (shared-seed)
        # epoch permutation — disjoint per-process slices of the dataset
    ):
        if not (0 <= shard_id < max(num_shards, 1)):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.num_shards = max(num_shards, 1)
        self.shard_id = shard_id
        self.use_processes = use_processes
        self._pool = None
        self._pending: List = []
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.never_ending = never_ending
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.seed = seed
        self.device_put_fn = device_put_fn
        self.dataset = None
        self._queue: Optional[queue.Queue] = None
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()
        self._epoch_lock = threading.Lock()
        self._order: List[int] = []
        self._cursor = 0
        self._epoch = 0
        if dataset is not None:
            self.set_dataset(dataset)

    # -- PersistentDataLoader parity: pool before dataset, set_dataset later --
    def set_dataset(self, dataset):
        self.shutdown()
        self.dataset = dataset
        self._stop = threading.Event()
        self._rng = np.random.RandomState(self.seed)
        self._reshuffle()
        if self.use_processes:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers,
                initializer=_proc_init,
                initargs=(dataset, self.collate_fn, self.seed),
            )
            self._pending = []
            self._fill_pending()
            return
        self._queue = queue.Queue(maxsize=self.prefetch)
        self._threads = [
            threading.Thread(target=self._worker_loop, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()

    def _fill_pending(self):
        """Keep enough async batch jobs in flight to saturate the pool."""
        target = self.num_workers + self.prefetch
        while len(self._pending) < target:
            indices = self._next_indices()
            if indices is None:
                break
            self._pending.append(self._pool.apply_async(_proc_load, (indices,)))

    def _reshuffle(self):
        n = len(self.dataset)
        # epoch permutations are a pure function of (seed, epoch) — NOT a
        # shared RNG stream — so sharded processes stay on identical
        # permutations no matter how reads/resampling consume randomness
        rng = np.random.RandomState((self.seed * 1_000_003 + self._epoch) % (2**31))
        order = list(rng.permutation(n) if self.shuffle else range(n))
        if self.num_shards > 1:
            if self.never_ending and n % self.num_shards:
                # equalize shard sizes (wrap the permutation, à la
                # DistributedSampler): unequal shards would reshuffle on
                # different cadences and the processes' stride slices would
                # drift onto different epochs — silently overlapping
                order = order + order[: self.num_shards - (n % self.num_shards)]
            # disjoint stride slices tile the (padded) epoch
            order = order[self.shard_id :: self.num_shards]
        self._order = order
        self._cursor = 0

    def _next_indices(self) -> Optional[List[int]]:
        with self._epoch_lock:
            if not self._order:
                raise RuntimeError(
                    f"loader shard {self.shard_id}/{self.num_shards} has no "
                    f"items (dataset len {len(self.dataset)}) — fewer items "
                    "than shards/processes?"
                )
            idx: List[int] = []
            while len(idx) < self.batch_size:
                if self._cursor >= len(self._order):
                    if not self.never_ending and not idx:
                        return None
                    if not self.never_ending:
                        break
                    self._epoch += 1
                    self._reshuffle()
                take = min(self.batch_size - len(idx), len(self._order) - self._cursor)
                idx.extend(self._order[self._cursor : self._cursor + take])
                self._cursor += take
            return idx

    def _worker_loop(self):
        try:
            import cv2

            cv2.setNumThreads(0)  # avoid nested-pool oversubscription
        except ImportError:
            pass
        while not self._stop.is_set():
            indices = self._next_indices()
            if indices is None:
                # end-of-data sentinel: bounded put must stay interruptible —
                # a blocking put would leave this thread stuck forever if the
                # consumer stops draining (e.g. run_val hit max_batches)
                while not self._stop.is_set():
                    try:
                        self._queue.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                return
            items = []
            for i in indices:
                item = self.dataset[i]
                tries = 0
                while item is None and tries < 10:  # resample failed reads
                    item = self.dataset[int(self._rng.randint(len(self.dataset)))]
                    tries += 1
                if item is not None:
                    items.append(item)
            if not items:
                continue
            while len(items) < len(indices):  # keep shapes static
                items.append(items[len(items) % max(len(items), 1)])
            batch = self.collate_fn(items)
            if self.device_put_fn is not None:
                batch = self.device_put_fn(batch)
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get_batch(self, timeout: Optional[float] = None):
        if self.use_processes:
            while True:
                if not self._pending:
                    # end of data (never_ending=False): _fill_pending found
                    # no more indices — mirror thread mode's None sentinel
                    return None
                # peek-then-pop: a bounded-timeout get (prefetch thread polls
                # its kill flag) must not drop the in-flight job on timeout
                job = self._pending[0]
                batch = job.get(timeout=timeout)
                self._pending.pop(0)
                self._fill_pending()
                if batch is None:
                    continue
                if self.device_put_fn is not None:
                    batch = self.device_put_fn(batch)
                return batch
        return self._queue.get(timeout=timeout)

    def __iter__(self):
        finished = 0
        while True:
            batch = self.get_batch()
            if batch is None:
                if self.use_processes:
                    return  # single end-of-data signal (no per-worker sentinels)
                finished += 1
                if finished >= self.num_workers:
                    return
                continue
            yield batch

    def shutdown(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
            self._pending = []
        if self._threads:
            self._stop.set()
            for t in self._threads:
                t.join(timeout=2.0)
            self._threads = []
        self._queue = None
