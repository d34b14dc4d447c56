"""Pre-packaged R2V2 tar-shard download.

Parity with reference ``download_scripts/download_r2v2.py:16-46``: fetch tar
shards from a URL list file and extract into the dataset layout. URLs come
from ``--urls-file`` (the reference ships ``info_files/r2v2_drive_urls.txt``);
fetching uses urllib — in offline environments this reports and exits.
"""

import argparse
import os
import tarfile

from vince_tpu.scrape.drive import fetch_url


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
    failed = []
    for i, (tag, url) in enumerate(shards):
        tar_path = os.path.join(args.output_path, f"shard_{tag}.tar")
        try:
            print(f"[{i + 1}/{len(shards)}] {tag}: {url}")
            # Drive share links go through the large-file confirm flow
            # (plain GETs of these multi-hundred-MB tars return HTML)
            fetch_url(url, tar_path)
            with tarfile.open(tar_path) as tf:
                # filter="data": never extract paths outside output_path
                # (these tars come from user-editable Drive URL lists)
                tf.extractall(args.output_path, filter="data")
        except Exception as e:
            # per-shard tolerance must cover ALL failure shapes: bad URL
            # lines (ValueError), truncated bodies (http.client errors),
            # interstitial HTML (ReadError), network (OSError)
            print(f"shard {tag} failed ({type(e).__name__}: {e}); continuing")
            failed.append(tag)
            continue
        finally:
            try:
                if os.path.exists(tar_path):
                    os.remove(tar_path)
            except OSError:
                pass
    if failed:
        print(f"{len(failed)}/{len(shards)} shards failed: {failed[:10]}"
              + ("..." if len(failed) > 10 else ""))


if __name__ == "__main__":
    main()
