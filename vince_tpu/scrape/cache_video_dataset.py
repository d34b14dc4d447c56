"""R2V2 cache-building driver.

Parity with reference ``youtube_scrape/cache_video_dataset.py:17-69``: read
video-id CSVs, skip already-cached and known-failed ids, drive
``VideoCacherDataset`` through a worker pool (download parallelism), and
persist failed ids to ``failed_video_ids.txt`` / ``no_images_video_ids.txt``
so reruns skip known-bad videos (SURVEY.md §5.3).
"""

import argparse
import concurrent.futures
import csv
import os
from typing import List, Set

from vince_tpu.data.video_cacher_dataset import VideoCacherDataset


def _read_id_file(path: str) -> Set[str]:
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def _read_csv_ids(path: str) -> List[str]:
    ids = []
    with open(path) as f:
        for row in csv.reader(f):
            if row:
                ids.append(row[0])
    return ids


def main(argv=None):
    parser = argparse.ArgumentParser(description="Cache filtered YouTube frames (R2V2 pipeline)")
    parser.add_argument("--csv-path", required=True, help="CSV of video ids")
    parser.add_argument("--output-path", required=True)
    parser.add_argument("--num-workers", type=int, default=16)
    parser.add_argument("--num-frames-to-cache", type=int, default=4)
    parser.add_argument("--video-sample-rate", type=int, default=5)
    parser.add_argument("--max-video-length", type=int, default=512)
    parser.add_argument("--max-side-size", type=int, default=480)
    parser.add_argument("--only-use-shots", action="store_true")
    parser.add_argument("--filter-using-flow", action="store_true")
    args = parser.parse_args(argv)

    all_ids = _read_csv_ids(args.csv_path)
    failed_path = os.path.join(args.output_path, "failed_video_ids.txt")
    no_images_path = os.path.join(args.output_path, "no_images_video_ids.txt")
    skip = _read_id_file(failed_path) | _read_id_file(no_images_path)
    cached = set()
    if os.path.isdir(args.output_path):
        for shard in os.listdir(args.output_path):
            sd = os.path.join(args.output_path, shard)
            if len(shard) == 2 and os.path.isdir(sd):
                cached.update(name.rsplit("_", 1)[0] for name in os.listdir(sd))
    todo = [v for v in all_ids if v not in skip and v not in cached]
    print(f"{len(todo)} videos to cache ({len(cached)} cached, {len(skip)} known-failed)")

    os.makedirs(args.output_path, exist_ok=True)
    dataset = VideoCacherDataset(
        args, todo, args.output_path,
        filter_using_flow=args.filter_using_flow,
        num_frames_to_cache=args.num_frames_to_cache,
    )
    failed, no_images = [], []
    with concurrent.futures.ThreadPoolExecutor(args.num_workers) as pool:
        for vid, code in pool.map(dataset.__getitem__, range(len(dataset))):
            if code == 1:
                failed.append(vid)
            elif code in (2, 3):
                no_images.append(vid)
    with open(failed_path, "a") as f:
        f.writelines(v + "\n" for v in failed)
    with open(no_images_path, "a") as f:
        f.writelines(v + "\n" for v in no_images)
    print(f"done: {len(todo) - len(failed) - len(no_images)} cached, "
          f"{len(failed)} download failures, {len(no_images)} filtered out")


if __name__ == "__main__":
    main()
