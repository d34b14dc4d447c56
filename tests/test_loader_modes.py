"""PersistentDataLoader worker-mode contracts: one-shot (never_ending=False)
iteration terminates cleanly in BOTH thread and fork-process modes, covering
the whole dataset exactly once (real-remainder tail batch)."""

import numpy as np
import pytest


class TinyDataset:
    """Picklable (fork workers) 10-item dataset of [2,2,3] uint8 'images'."""

    def __len__(self):
        return 10

    def __getitem__(self, idx):
        return {"data": np.full((2, 2, 3), idx, np.uint8), "idx": np.int64(idx)}


def _collate(items):
    return {
        "data": np.stack([it["data"] for it in items]),
        "idx": np.stack([it["idx"] for it in items]),
    }


# JAX warns that fork+threads can deadlock; the forked decode workers never
# touch JAX (host numpy only), which is exactly why the loader forks —
# expected, not a bug
@pytest.mark.filterwarnings("ignore:os.fork\\(\\) was called:RuntimeWarning")
@pytest.mark.parametrize("use_processes", [False, True])
def test_one_shot_iteration_terminates(use_processes):
    from vince_tpu.data.loader import PersistentDataLoader

    loader = PersistentDataLoader(
        TinyDataset(), batch_size=4, num_workers=2, never_ending=False,
        shuffle=False, collate_fn=_collate, use_processes=use_processes,
    )
    try:
        batches = list(loader)
    finally:
        loader.shutdown()
    # 10 items / 4 per batch = 3 batches; the tail batch carries the real
    # 2-item remainder (epoch-sized val passes weight it by actual rows)
    assert len(batches) == 3, [b["idx"] for b in batches]
    assert sorted(b["data"].shape[0] for b in batches) == [2, 4, 4]
    seen = np.concatenate([b["idx"] for b in batches])
    assert set(seen.tolist()) == set(range(10))
