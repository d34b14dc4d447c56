"""New data/weight-fetch entry points: CLI contracts and offline behavior
(reference download_scripts/*; zero-egress sandbox exercises the failure
path and the fabricated-cache loading path)."""

import os
import types
import urllib.request

import numpy as np
import pytest


def test_download_pretrained_weights_offline(monkeypatch, tmp_path):
    from vince_tpu.scrape import drive
    from vince_tpu.scrape.download_pretrained_weights import main

    class DenyOpener:
        def open(self, url):
            raise OSError("no egress")

    monkeypatch.setattr(drive, "_default_opener", DenyOpener)
    with pytest.raises(SystemExit, match="download failed"):
        main(["--backbone", "ResNet18", "--output-path", str(tmp_path)])


class _FakeResponse:
    def __init__(self, payload: bytes):
        self._buf = payload

    def read(self, n=-1):
        if n is None or n < 0:
            out, self._buf = self._buf, b""
        else:
            out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def close(self):
        pass


class _ScriptedOpener:
    """Returns scripted payloads in order; records the URLs requested."""

    def __init__(self, payloads):
        self.payloads = list(payloads)
        self.urls = []

    def open(self, url):
        self.urls.append(url)
        return _FakeResponse(self.payloads.pop(0))


_INTERSTITIAL = b"""<!DOCTYPE html><html><body>
<form id="download-form" action="https://drive.usercontent.google.com/download" method="get">
<input type="submit" value="Download anyway"/>
<input type="hidden" name="id" value="FILEID"/>
<input type="hidden" name="export" value="download"/>
<input type="hidden" name="confirm" value="t"/>
<input type="hidden" name="uuid" value="abc-123"/>
</form></body></html>"""


def test_drive_fetch_small_file_direct(tmp_path):
    """Non-HTML first response streams straight to disk."""
    from vince_tpu.scrape.drive import drive_fetch

    opener = _ScriptedOpener([b"\x00tar-bytes" * 10])
    dest = str(tmp_path / "out.tar")
    drive_fetch("FILEID", dest, opener=opener)
    assert open(dest, "rb").read() == b"\x00tar-bytes" * 10
    assert opener.urls == [
        "https://drive.google.com/uc?export=download&id=FILEID"
    ]


def test_drive_fetch_follows_confirm_form(tmp_path):
    """The virus-scan interstitial (why the reference used gdown) is followed
    through its hidden-field form to the real payload."""
    from vince_tpu.scrape.drive import drive_fetch

    opener = _ScriptedOpener([_INTERSTITIAL, b"REAL-TAR-PAYLOAD"])
    dest = str(tmp_path / "out.tar")
    drive_fetch("FILEID", dest, opener=opener)
    assert open(dest, "rb").read() == b"REAL-TAR-PAYLOAD"
    follow = opener.urls[1]
    assert follow.startswith("https://drive.usercontent.google.com/download?")
    assert "id=FILEID" in follow and "confirm=t" in follow and "uuid=abc-123" in follow


def test_drive_fetch_resolves_relative_form_action(tmp_path):
    """A relative form action resolves against the interstitial's URL."""
    from vince_tpu.scrape.drive import drive_fetch

    page = (b"<html><body><form id=\"download-form\" action=\"/download\" "
            b"method=\"get\"><input type=\"hidden\" name=\"confirm\" "
            b"value=\"t\"/></form></body></html>")
    opener = _ScriptedOpener([page, b"PAYLOAD"])
    drive_fetch("FILEID", str(tmp_path / "out.tar"), opener=opener)
    follow = opener.urls[1]
    assert follow.startswith("https://drive.google.com/download?")
    assert "confirm=t" in follow and "id=FILEID" in follow


def test_drive_fetch_follows_legacy_confirm_token(tmp_path):
    """Older interstitials carry confirm=<token> in a link (cookie flow)."""
    from vince_tpu.scrape.drive import drive_fetch

    legacy = (b"<html><body><a href=\"/uc?export=download&amp;"
              b"confirm=TOKEN123&amp;id=FILEID\">Download anyway</a>"
              b"</body></html>")
    opener = _ScriptedOpener([legacy, b"LEGACY-PAYLOAD"])
    dest = str(tmp_path / "out.tar")
    drive_fetch("FILEID", dest, opener=opener)
    assert open(dest, "rb").read() == b"LEGACY-PAYLOAD"
    assert opener.urls[1] == ("https://drive.google.com/uc?export=download"
                              "&confirm=TOKEN123&id=FILEID")


def test_drive_fetch_rejects_formless_html(tmp_path):
    from vince_tpu.scrape.drive import drive_fetch

    opener = _ScriptedOpener([b"<html><body>Quota exceeded</body></html>"])
    with pytest.raises(OSError, match="no download form"):
        drive_fetch("FILEID", str(tmp_path / "out.tar"), opener=opener)


def test_extract_drive_id_url_shapes():
    from vince_tpu.scrape.drive import extract_drive_id

    assert extract_drive_id("https://drive.google.com/open?id=AbC_-123") == "AbC_-123"
    assert extract_drive_id(
        "https://drive.google.com/file/d/XyZ987/view?usp=sharing") == "XyZ987"
    assert extract_drive_id(
        "https://drive.google.com/uc?export=download&id=Q") == "Q"
    assert extract_drive_id("https://example.com/shard.tar") is None


def test_bench_loader_cache_feeds_r2v2_dataset(tmp_path):
    """tools/bench_host_loader fabricates a layout-correct R2V2 shard tree
    (was tools/bench_loader until round 3 reused that name for the staging
    bench — this import breaking is how the overwrite was caught)."""
    from tools.bench_host_loader import FRAMES_PER_VIDEO, make_cache
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
