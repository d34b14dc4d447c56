"""Video filter cascade + tracking crop ops (host-side, cv2-based)."""

import numpy as np

from vince_tpu.utils import video_utils
from vince_tpu.tracking.ops import get_cropped_input, iou_xyxy, xywh_to_xyxy


def _frames(n=6, size=128, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (size, size, 3), np.uint8) for _ in range(n)]


def test_filter_similar_frames_drops_duplicates():
    frames = _frames(3)
    seq = [frames[0], frames[0], frames[1], frames[1], frames[2]]
    kept, inds = video_utils.filter_similar_frames(seq, return_inds=True)
    assert list(inds) == [0, 2, 4]


def test_filter_laplacian_drops_blurry():
    import cv2

    sharp = _frames(1)[0]
    blurry = cv2.GaussianBlur(sharp, (31, 31), 12)
    kept, inds = video_utils.filter_using_laplacian(
        np.stack([sharp, blurry, sharp]), return_inds=True
    )
    assert 1 not in list(inds) and 0 in list(inds)


def test_remove_border_crops_letterbox():
    frames = _frames(4, size=120)
    boxed = []
    for f in frames:
        g = np.zeros_like(f)
        g[20:100, 10:110] = f[20:100, 10:110]
        boxed.append(g)
    cropped, (x1, x2, y1, y2) = video_utils.remove_border(boxed, return_inds=True)
    assert y1 >= 10 and y2 <= 110 and x1 >= 4 and x2 <= 116
    assert cropped[0].shape[0] < 120 and cropped[0].shape[1] < 120


def test_get_shots_detects_cut():
    a = np.full((64, 64, 3), 30, np.uint8)
    b = np.full((64, 64, 3), 220, np.uint8)
    seq = np.stack([a] * 4 + [b] * 4)
    shots, borders = video_utils.get_shots(seq, return_inds=True)
    assert len(shots) == 2 and borders == [0, 4, 8]


def test_max_resize():
    img = np.zeros((200, 400, 3), np.uint8)
    out = video_utils.max_resize(img, 100)
    assert max(out.shape[:2]) == 100 and out.shape[:2] == (50, 100)
    assert video_utils.max_resize(img, 500) is img  # no-op under limit


def test_get_cropped_input_identity_and_oob():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    crop, m = get_cropped_input(img, [0, 0, 64, 64], 1.0, 64)
    np.testing.assert_allclose(crop, img, atol=2)
    # out-of-bounds crop pads with mean color, no crash
    crop2, _ = get_cropped_input(img, [-32, -32, 32, 32], 1.0, 64)
    assert crop2.shape == (64, 64, 3)
    pad_region = crop2[:10, :10].astype(np.float32)
    assert abs(pad_region.mean() - img.mean()) < 30


def test_iou_and_boxes():
    a = xywh_to_xyxy(np.array([0, 0, 10, 10]))
    b = xywh_to_xyxy(np.array([5, 5, 10, 10]))
    assert abs(iou_xyxy(a, b) - 25.0 / 175.0) < 1e-6
    assert iou_xyxy(a, a) == 1.0


def test_cache_driver_failed_id_persistence(tmp_path, monkeypatch):
    """The cache driver must skip known-failed/cached ids on rerun and append
    new failures to the id files (reference cache_video_dataset.py:39-65,
    SURVEY §5.3 fault handling)."""
    import vince_tpu.scrape.cache_video_dataset as mod

    csv_path = tmp_path / "ids.csv"
    csv_path.write_text("vidA\nvidB\nvidC\nvidD\n")
    out = tmp_path / "cache"
    out.mkdir()
    (out / "failed_video_ids.txt").write_text("vidA\n")
    # simulate an already-cached video: shard dir "vi" with frames of vidB
    (out / "vi").mkdir()
    (out / "vi" / "vidB_000001.jpg").write_bytes(b"")

    seen = []

    class FakeCacher:
        def __init__(self, args, ids, output, **kw):
            self.ids = list(ids)

        def __len__(self):
            return len(self.ids)

        def __getitem__(self, i):
            seen.append(self.ids[i])
            # vidC "downloads" fine, vidD fails
            return (self.ids[i], 0 if self.ids[i] == "vidC" else 1)

    monkeypatch.setattr(mod, "VideoCacherDataset", FakeCacher)
    mod.main([
        "--csv-path", str(csv_path), "--output-path", str(out), "--num-workers", "2",
    ])
    assert sorted(seen) == ["vidC", "vidD"]  # vidA (failed) + vidB (cached) skipped
    failed = (out / "failed_video_ids.txt").read_text().split()
    assert failed == ["vidA", "vidD"]  # appended, not overwritten

    # rerun: nothing left to do
    seen.clear()
    mod.main(["--csv-path", str(csv_path), "--output-path", str(out)])
    assert seen == ["vidC"] or seen == []  # vidC cached only if it wrote files — driver skips by dir scan
