"""New data/weight-fetch entry points: CLI contracts and offline behavior
(reference download_scripts/*; zero-egress sandbox exercises the failure
path and the fabricated-cache loading path)."""

import os
import types
import urllib.request

import numpy as np
import pytest


def test_download_pretrained_weights_offline(monkeypatch, tmp_path):
    from vince_tpu.scrape.download_pretrained_weights import main

    def deny(url, path):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlretrieve", deny)
    with pytest.raises(SystemExit, match="download failed"):
        main(["--backbone", "ResNet18", "--output-path", str(tmp_path)])


def test_bench_loader_cache_feeds_r2v2_dataset(tmp_path):
    """tools/bench_loader fabricates a layout-correct R2V2 shard tree."""
    from tools.bench_loader import FRAMES_PER_VIDEO, make_cache
    from vince_tpu.data.r2v2_dataset import R2V2Dataset

    make_cache(str(tmp_path), num_videos=3)
    args = types.SimpleNamespace(
        data_path=str(tmp_path), num_frames=2, input_width=32, multi_frame=True
    )
    ds = R2V2Dataset(args, "train", check_for_new_data=True)
    assert len(ds) == 3
    vid, frames = ds.index.path_info[0]
    assert len(vid) == 11 and len(frames) == FRAMES_PER_VIDEO
    item = ds[0]
    assert item["data"].shape == (2, ds.canvas, ds.canvas, 3)
    assert item["data"].dtype == np.uint8
    # shard dir is the 2-char prefix (reference r2v2_dataset.py:14-34)
    assert os.path.isdir(os.path.join(tmp_path, "train", vid[:2]))
