"""Standalone visualization CLIs run end-to-end on the CPU mesh.

Parity targets: reference ``visualizations/attention.py:7-23`` (overlay
script), ``visualizations/dataset_mosaic.py`` and
``visualizations/view_nearest_neighbors.py`` (offline grids). The panel math
itself is pinned in test_panels.py; these drive the actual ``main()`` entry
points (sys.argv parsing, solver bring-up, file output).
"""

import os
import sys


def _argv(tmp_path, extra):
    return [
        "prog",
        "--title", "viz_t", "--description", "vz",
        "--solver", "VinceSolver",
        "--dataset", "SyntheticVideoDataset", "--use-videos",
        "--inter-batch-comparison", "--num-frames", "2",
        "--batch-size", "8",
        "--input-width", "32", "--input-height", "32",
        "--vince-queue-size", "32", "--vince-embedding-size", "16",
        "--base-lr", "0.03",
        "--base-logdir", str(tmp_path),
        "--mesh-data-size", "4", "--mesh-queue-size", "2",
        "--num-workers", "2", "--synthetic-num-videos", "16",
        "--num-images", "6",
        "--output-dir", str(tmp_path / "viz"),
    ] + extra


def test_attention_cli(tmp_path, cpu_devices, monkeypatch):
    from vince_tpu.visualizations.attention import main

    monkeypatch.setattr(sys, "argv", _argv(tmp_path, ["--use-attention"]))
    main()
    out = tmp_path / "viz" / "attention_vz.jpg"
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_dataset_mosaic_cli(tmp_path, cpu_devices, monkeypatch):
    from vince_tpu.visualizations.dataset_mosaic import main

    monkeypatch.setattr(sys, "argv", _argv(tmp_path, ["--with-tsne"]))
    main()
    for name in ("mosaic.jpg", "tsne.jpg"):
        out = tmp_path / "viz" / name
        assert os.path.exists(out) and os.path.getsize(out) > 0


def test_view_nearest_neighbors_cli(tmp_path, cpu_devices, monkeypatch):
    from vince_tpu.visualizations.view_nearest_neighbors import main

    monkeypatch.setattr(sys, "argv", _argv(tmp_path, []))
    main()
    grids = [f for f in os.listdir(tmp_path / "viz") if f.endswith(".jpg")]
    assert grids
