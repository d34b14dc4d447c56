#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (decode side).

NOTE: this was tools/bench_loader.py until round 3, when that name was
reused for the batch-STAGING saturation bench; restored round 4 under its
own name (the round-3 overwrite silently broke
tests/test_download_entry_points.py::test_bench_loader_cache_feeds_r2v2_dataset
and dropped the only R2V2 shard-tree fabricator).

The chip consumes ~1979 frames/s (R50 b=128@224²) to ~4644 frames/s (R18
b=256) per v5e; the host loader must sustain that rate in the background.
This bench fabricates an R2V2-style JPEG frame cache (2-char shard dirs,
``AA/AA…_000001.jpg``, 480×360 frames like the reference's max-side-480 cache
— reference ``video_cacher_dataset.py:190-210``), then measures:

  1. raw single-thread JPEG decode+resize rate (the per-worker ceiling),
  2. ``PersistentDataLoader`` end-to-end frames/s in thread and process mode,

and reports the worker count needed to keep each chip-side rate fed.

Usage: python tools/bench_loader.py [--videos 64] [--workers N] [--batches 20]
"""
import argparse
import os
import shutil
import tempfile
import time
import types

import cv2
import numpy as np

from vince_tpu.data.loader import PersistentDataLoader, collate_video_batch
from vince_tpu.data.r2v2_dataset import R2V2Dataset

FRAME_W, FRAME_H, FRAMES_PER_VIDEO, JPEG_QUALITY = 480, 360, 8, 90


def make_cache(root: str, num_videos: int, seed: int = 0) -> None:
    """Synthetic frames with photo-like spectra (smoothed noise + gradients)
    so JPEG size/decode cost is realistic (~25-40 KB/frame), not the
    pathological pure-noise worst case."""
    rng = np.random.RandomState(seed)
    split = os.path.join(root, "train")
    yy, xx = np.mgrid[0:FRAME_H, 0:FRAME_W].astype(np.float32)
    for v in range(num_videos):
        vid = "".join(rng.choice(list("ABCDEFGHIJKLMNOPQRSTUVWXYZab-_"), 11))
        d = os.path.join(split, vid[:2])
        os.makedirs(d, exist_ok=True)
        base = rng.rand(3) * 255
        for f in range(FRAMES_PER_VIDEO):
            img = np.stack(
                [
                    base[c]
                    + 60 * np.sin(xx / (20 + 10 * c) + f * 0.3)
                    + 40 * np.cos(yy / (15 + 5 * c))
                    for c in range(3)
                ],
                axis=-1,
            )
            img += cv2.GaussianBlur(
                rng.randn(FRAME_H, FRAME_W, 3) * 40, (0, 0), 3
            )
            path = os.path.join(d, f"{vid}_{f + 1:06d}.jpg")
            cv2.imwrite(
                path,
                np.clip(img, 0, 255).astype(np.uint8),
                [cv2.IMWRITE_JPEG_QUALITY, JPEG_QUALITY],
            )


def bench_raw_decode(ds: R2V2Dataset, seconds: float = 3.0) -> float:
    paths = []
    for idx in range(min(len(ds), 32)):
        vid, frame_ids = ds.index.path_info[idx]
        paths += [ds.frame_path(vid, int(f)) for f in frame_ids[:4]]
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        p = paths[n % len(paths)]
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        cv2.resize(img, (ds.canvas, ds.canvas), interpolation=cv2.INTER_LINEAR)
        n += 1
    return n / (time.perf_counter() - t0)


def bench_loader(ds, items_per_batch, workers, batches, use_processes) -> float:
    loader = PersistentDataLoader(
        batch_size=items_per_batch,
        num_workers=workers,
        collate_fn=collate_video_batch,
        use_processes=use_processes,
        seed=0,
    )
    loader.set_dataset(ds)
    try:
        for _ in range(3):  # warm the pool / prefetch
            loader.get_batch()
        frames = 0
        t0 = time.perf_counter()
        for _ in range(batches):
            b = loader.get_batch()
            frames += b["data"].shape[0] + b["queue_data"].shape[0]
        return frames / (time.perf_counter() - t0)
    finally:
        loader.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--workers", type=int, default=max(1, (os.cpu_count() or 1)))
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--items-per-batch", type=int, default=8,
                    help="videos per batch (x num_frames pairs = frames)")
    ap.add_argument("--keep-dir", default=None,
                    help="reuse/keep the fabricated cache at this path")
    args = ap.parse_args()

    root = args.keep_dir or tempfile.mkdtemp(prefix="bench_loader_")
    if not os.path.isdir(os.path.join(root, "train")):
        t0 = time.perf_counter()
        make_cache(root, args.videos)
        print(f"fabricated {args.videos} videos x {FRAMES_PER_VIDEO} frames "
              f"in {time.perf_counter() - t0:.1f}s at {root}")

    ds_args = types.SimpleNamespace(
        data_path=root, num_frames=2, input_width=224, multi_frame=True
    )
    ds = R2V2Dataset(ds_args, "train", check_for_new_data=True)
    sizes = [os.path.getsize(os.path.join(dp, f))
             for dp, _, fs in os.walk(os.path.join(root, "train")) for f in fs]
    print(f"dataset: {len(ds)} videos, mean JPEG {np.mean(sizes)/1024:.0f} KB, "
          f"canvas {ds.canvas}²")

    raw = bench_raw_decode(ds)
    print(f"raw decode+resize (1 thread): {raw:.0f} frames/s")

    results = {"raw_decode_fps_per_worker": round(raw)}
    for mode, use_proc in (("threads", False), ("processes", True)):
        fps = bench_loader(ds, args.items_per_batch, args.workers, args.batches, use_proc)
        results[f"loader_fps_{mode}_{args.workers}w"] = round(fps)
        print(f"loader ({mode}, {args.workers} workers): {fps:.0f} frames/s")

    for name, chip in (("R50 b=128@224 (1979 f/s)", 1979), ("R18 b=256 (4644 f/s)", 4644)):
        print(f"  workers to feed {name}: {chip / raw:.1f} decode-bound cores")
    print(results)


if __name__ == "__main__":
    main()
