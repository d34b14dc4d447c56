"""Pre-packaged R2V2 tar-shard download.

Parity with reference ``download_scripts/download_r2v2.py:16-46``: fetch tar
shards from a URL list file and extract into the dataset layout. URLs come
from ``--urls-file`` (the reference ships ``info_files/r2v2_drive_urls.txt``);
fetching uses urllib — in offline environments this reports and exits.
"""

import argparse
import os
import tarfile
import urllib.request


def main(argv=None):
    parser = argparse.ArgumentParser(description="Download pre-packaged R2V2 shards")
    parser.add_argument("--urls-file", required=True)
    parser.add_argument("--output-path", required=True)
    args = parser.parse_args(argv)

    shards = []
    with open(args.urls_file) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            # info_files/r2v2_drive_urls.txt rows are "<shard-tag> <url>";
            # tolerate bare-URL lists too
            if len(parts) == 2:
                shards.append((parts[0], parts[1]))
            else:
                shards.append((f"{len(shards):04d}", parts[0]))
    os.makedirs(args.output_path, exist_ok=True)
    for i, (tag, url) in enumerate(shards):
        # Drive share links ("open?id=X") need the direct-download endpoint
        if "drive.google.com/open?" in url:
            from urllib.parse import parse_qs, urlparse

            qs = parse_qs(urlparse(url).query)
            if qs.get("id"):
                url = ("https://drive.google.com/uc?export=download&id="
                       + qs["id"][0])
        tar_path = os.path.join(args.output_path, f"shard_{tag}.tar")
        try:
            print(f"[{i + 1}/{len(shards)}] {tag}: {url}")
            urllib.request.urlretrieve(url, tar_path)
        except OSError as e:
            print(f"download failed ({e}); offline environment?")
            continue
        with tarfile.open(tar_path) as tf:
            tf.extractall(args.output_path)
        os.remove(tar_path)


if __name__ == "__main__":
    main()
