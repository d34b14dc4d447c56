"""YouTube download/search helpers.

Replaces the ``dg_util.youtube_utils`` surface (SURVEY.md §2.9):
``download_video``, ``get_video_url``, ``search_youtube``. Downloads shell out
to ``yt-dlp``/``youtube-dl`` when installed; in offline environments every
entry point degrades to a clear error instead of crashing the pipeline (the
cacher records the failure code, reference ``video_cacher_dataset.py:79-80``).
"""

import os
import shutil
import subprocess
from typing import List, Optional


def get_video_url(video_id: str) -> str:
    return f"https://www.youtube.com/watch?v={video_id}"


def _downloader() -> Optional[str]:
    for exe in ("yt-dlp", "youtube-dl"):
        if shutil.which(exe):
            return exe
    return None


def download_video(
    video_id: str,
    video_path: str = "/tmp/downloaded_videos",
    cookie_path: str = "",
    max_height: int = 360,
    timeout: int = 300,
) -> Optional[str]:
    """Download a video; returns the local file path or None on failure."""
    exe = _downloader()
    if exe is None:
        print("youtube download unavailable: install yt-dlp (offline environment?)")
        return None
    os.makedirs(video_path, exist_ok=True)
    out_template = os.path.join(video_path, f"{video_id}.%(ext)s")
    cmd = [
        exe, get_video_url(video_id),
        "-f", f"mp4[height<={max_height}]/best[height<={max_height}]/best",
        "-o", out_template, "--no-playlist", "--quiet",
    ]
    if cookie_path:
        cmd += ["--cookies", cookie_path]
    try:
        subprocess.run(cmd, check=True, timeout=timeout,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    for ext in ("mp4", "mkv", "webm"):
        path = os.path.join(video_path, f"{video_id}.{ext}")
        if os.path.exists(path):
            return path
    return None


def search_youtube(
    query: str, max_results: int = 50, cc_only: bool = True, max_minutes: int = 4
) -> List[str]:
    """Search for video ids (reference search pipeline filters CC-licensed
    videos under 4 minutes, ``search_youtube_for_urls.py:22``)."""
    exe = _downloader()
    if exe is None:
        print("youtube search unavailable: install yt-dlp (offline environment?)")
        return []
    search = f"ytsearch{max_results}:{query}" + (", creative commons" if cc_only else "")
    cmd = [exe, search, "--get-id", "--flat-playlist", "--quiet"]
    if max_minutes:
        cmd += ["--match-filter", f"duration < {max_minutes * 60}"]
    try:
        out = subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=600
        ).stdout
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return []
    return [line.strip() for line in out.splitlines() if line.strip()]
