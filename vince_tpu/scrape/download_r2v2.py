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

    with open(args.urls_file) as f:
        urls = [line.strip() for line in f if line.strip()]
    os.makedirs(args.output_path, exist_ok=True)
    for i, url in enumerate(urls):
        tar_path = os.path.join(args.output_path, f"shard_{i:04d}.tar")
        try:
            print(f"[{i + 1}/{len(urls)}] {url}")
            urllib.request.urlretrieve(url, tar_path)
        except OSError as e:
            print(f"download failed ({e}); offline environment?")
            continue
        with tarfile.open(tar_path) as tf:
            tf.extractall(args.output_path)
        os.remove(tar_path)


if __name__ == "__main__":
    main()
