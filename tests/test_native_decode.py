"""Native (C++) JPEG decode path: parity with the cv2 pipeline it replaces.

Reference behavior: ``datasets/base_dataset.py:46-56`` (tolerant read →
RGB uint8 canvas; None on failure, collate filters). The native path is
opt-in (``--native-decode``); these tests pin its equivalence.
"""

import os

import cv2
import numpy as np
import pytest

from vince_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decode lib unavailable (no g++/libjpeg)"
)


def _jpeg(shape=(120, 160), quality=92, seed=0):
    rng = np.random.RandomState(seed)
    # smooth-ish content so JPEG decode differences stay small
    img = cv2.resize(
        rng.randint(0, 256, (12, 16, 3), np.uint8), shape[::-1],
        interpolation=cv2.INTER_CUBIC,
    )
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return enc.tobytes()


def _cv2_ref(data, canvas):
    bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    return cv2.resize(rgb, (canvas, canvas), interpolation=cv2.INTER_LINEAR)


def test_full_scale_decode_matches_cv2():
    # image smaller than the canvas → no DCT scaling, same decode + same
    # bilinear semantics; residue is decoder rounding only
    data = _jpeg((120, 160))
    out = native.decode_jpeg(data, 192)
    ref = _cv2_ref(data, 192)
    assert out.shape == (192, 192, 3)
    d = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() < 1.0 and np.percentile(d, 99) <= 4


def test_scaled_decode_close_to_cv2():
    # large image → DCT-domain scaled decode (different but equivalent
    # downsampling path); statistically close to full-decode + resize
    data = _jpeg((720, 1280), seed=1)
    out = native.decode_jpeg(data, 256)
    ref = _cv2_ref(data, 256)
    d = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() < 3.0


def test_corrupt_and_truncated_return_none():
    assert native.decode_jpeg(b"\xff\xd8definitely-not-a-jpeg", 64) is None
    data = _jpeg((120, 160))
    # truncated JPEGs may decode partially under libjpeg error recovery;
    # the contract is only: no crash, and either None or a canvas array
    out = native.decode_jpeg(data[: len(data) // 3], 64)
    assert out is None or out.shape == (64, 64, 3)


def test_file_roundtrip(tmp_path):
    data = _jpeg((100, 80), seed=2)
    p = tmp_path / "x.jpg"
    p.write_bytes(data)
    out = native.decode_jpeg_file(str(p), 96)
    assert out is not None and out.shape == (96, 96, 3)
    assert native.decode_jpeg_file(str(tmp_path / "missing.jpg"), 96) is None


def test_pool_batch_with_failures():
    datas = [_jpeg((120, 160), seed=i) for i in range(5)]
    datas[2] = b"garbage"
    pool = native.DecodePool(3)
    try:
        outs, oks = pool.decode(datas, 64)
    finally:
        pool.close()
    assert outs.shape == (5, 64, 64, 3)
    assert list(oks) == [True, True, False, True, True]
    for i in (0, 1, 3, 4):
        ref = _cv2_ref(datas[i], 64)
        d = np.abs(outs[i].astype(np.int16) - ref.astype(np.int16))
        assert d.mean() < 2.0


def test_read_image_native_path(tmp_path, monkeypatch):
    """BaseDataset.read_image honors the flag and stays canvas-shaped."""
    from types import SimpleNamespace

    from vince_tpu.data.base_dataset import BaseDataset, canvas_size

    class DS(BaseDataset):
        def __len__(self):
            return 0

        def __getitem__(self, idx):
            return None

    p = tmp_path / "f.jpg"
    p.write_bytes(_jpeg((300, 400), seed=3))
    args = SimpleNamespace(input_width=64, native_decode=True)
    ds = DS(args)
    out = ds.read_image(str(p))
    c = canvas_size(64)
    assert out is not None and out.shape == (c, c, 3)
    # parity with the cv2 path of a flag-off dataset
    ds_cv = DS(SimpleNamespace(input_width=64, native_decode=False))
    ref = ds_cv.read_image(str(p))
    d = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert d.mean() < 3.0
    # non-JPEG falls back to cv2 (PNG)
    png = tmp_path / "f.png"
    cv2.imwrite(str(png), np.full((40, 40, 3), 128, np.uint8))
    assert ds.read_image(str(png)).shape == (c, c, 3)


def test_pool_concurrent_submitters():
    """A DecodePool shared across Python threads serializes submissions
    (Pool::Map is single-caller) — results stay per-caller correct."""
    import threading

    datas = [_jpeg((100 + 10 * i, 140), seed=10 + i) for i in range(4)]
    pool = native.DecodePool(2)
    # golden: what each buffer decodes to with no concurrent submitters
    refs = [pool.decode([d], 64)[0][0].copy() for d in datas]
    errors = []

    def worker(idx):
        try:
            for _ in range(5):
                outs, oks = pool.decode([datas[idx]], 64)
                assert oks.all()
                # bitwise match — any cross-submission contamination of the
                # shared Map cursor/output slots would corrupt this
                assert np.array_equal(outs[0], refs[idx])
        except Exception as e:  # pragma: no cover - failure path
            errors.append((idx, e))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        pool.close()
    assert not errors, errors
