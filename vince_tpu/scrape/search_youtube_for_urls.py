"""YouTube search → train/val id CSVs.

Parity with reference ``youtube_scrape/search_youtube_for_urls.py``: threaded
search over ImageNet category strings (CC-licensed, <4 min — :22), dedup, and
a 65,536-id val split with the rest as train (:49-61).
"""

import argparse
import concurrent.futures
import csv
import os
import random

from vince_tpu.utils.util_functions import _load_class_names, load_imagenet_categories
from vince_tpu.utils.youtube_utils import search_youtube

VAL_SIZE = 65536  # reference :49-61


def main(argv=None):
    parser = argparse.ArgumentParser(description="Search YouTube for category videos")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--num-workers", type=int, default=64)
    parser.add_argument("--results-per-query", type=int, default=50)
    parser.add_argument("--queries-file", default=None,
                        help="one search query per line (default: the full "
                             "WordNet category table, reference :66)")
    args = parser.parse_args(argv)

    if args.queries_file:
        with open(args.queries_file) as f:
            queries = [line.strip() for line in f if line.strip()]
    else:
        # reference iterates the 21,841-synset table; fall back to the
        # 1000-class names if the big table is absent
        queries = [name for _, name in load_imagenet_categories()]
        if not queries:
            queries = _load_class_names("imagenet_classes.txt") or []
    if not queries:
        raise SystemExit("no queries (provide --queries-file or info_files/*)")

    ids = set()
    with concurrent.futures.ThreadPoolExecutor(args.num_workers) as pool:
        for result in pool.map(
            lambda q: search_youtube(q, args.results_per_query), queries
        ):
            ids.update(result)
    ids = sorted(ids)
    random.Random(0).shuffle(ids)
    val, train = ids[:VAL_SIZE], ids[VAL_SIZE:]
    os.makedirs(args.output_dir, exist_ok=True)
    for name, rows in (("train", train), ("val", val)):
        with open(os.path.join(args.output_dir, f"{name}_ids.csv"), "w", newline="") as f:
            csv.writer(f).writerows([[v] for v in rows])
    print(f"wrote {len(train)} train / {len(val)} val ids")


if __name__ == "__main__":
    main()
