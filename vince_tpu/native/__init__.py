"""ctypes bindings for the native (C++) host-pipeline components.

``decode`` — libjpeg decode + resize with a GIL-free thread pool
(``decode.cc``). Built lazily with g++ on first use; every entry point
degrades gracefully (returns ``None`` / ``available() == False``) when no
toolchain or libjpeg is present, so the pure-Python cv2 path keeps working.

Replaces (as an opt-in fast path) the decode stage the reference ran inside
torch DataLoader worker processes (reference ``datasets/base_dataset.py:46-56``).
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cc")
_LIB = os.path.join(_DIR, "libvince_decode.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    # -march=native is safe: the .so is always built lazily on the host it
    # runs on (and rebuilt whenever decode.cc is newer than it).
    # Compile to a per-process temp path and os.rename into place: with
    # --loader-processes, N forked workers can race here (the threading lock
    # is per-process), and dlopen of a half-written ELF fails or worse.
    # rename is atomic on the same filesystem, so every worker maps either
    # the old complete .so or the new complete one.
    tmp = f"{_LIB}.build.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", tmp, "-ljpeg", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            # older toolchains may reject -march=native; retry portable
            cmd = [c for c in cmd if c != "-march=native"]
            res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if res.returncode != 0:
                return False
        os.replace(tmp, _LIB)
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except OSError:
            pass
    return os.path.exists(_LIB)


def _load():
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        lib.vt_decode_jpeg.restype = ctypes.c_int
        lib.vt_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p]
        lib.vt_decode_jpeg_file.restype = ctypes.c_int
        lib.vt_decode_jpeg_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p]
        lib.vt_pool_new.restype = ctypes.c_void_p
        lib.vt_pool_new.argtypes = [ctypes.c_int]
        lib.vt_pool_free.argtypes = [ctypes.c_void_p]
        lib.vt_pool_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        lib.vt_pool_decode_files.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes, canvas: int) -> Optional[np.ndarray]:
    """Decode a JPEG byte buffer to an RGB uint8 [canvas, canvas, 3] array
    (DCT-scaled decode + bilinear resize). None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.vt_decode_jpeg(data, len(data), canvas,
                            out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def decode_jpeg_file(path: str, canvas: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.vt_decode_jpeg_file(path.encode(), canvas,
                                 out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


class DecodePool:
    """Persistent C++ thread pool for batched decode (GIL released for the
    whole batch — unlike Python threads, the resize work parallelizes too)."""

    def __init__(self, n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decode library unavailable")
        self._lib = lib
        n = n_threads or int(os.environ.get("VINCE_DECODE_THREADS", "0")) \
            or (os.cpu_count() or 1)
        self._pool = lib.vt_pool_new(int(n))
        self.n_threads = int(n)
        # Pool::Map is single-caller (one shared task cursor); serialize
        # batch submissions so a pool shared across Python threads is safe —
        # the batch itself still fans out over the C++ threads.
        self._submit_lock = threading.Lock()

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.vt_pool_free(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover - interpreter-shutdown path
        try:
            self.close()
        except Exception:
            pass

    def decode(self, items: Sequence[bytes], canvas: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """[n] JPEG buffers → ([n, canvas, canvas, 3] uint8, [n] ok mask)."""
        n = len(items)
        outs = np.empty((n, canvas, canvas, 3), np.uint8)
        oks = (ctypes.c_int * n)()
        bufs = (ctypes.c_char_p * n)(*items)
        lens = (ctypes.c_size_t * n)(*[len(b) for b in items])
        with self._submit_lock:
            self._lib.vt_pool_decode(self._pool, n, bufs, lens, canvas,
                                     outs.ctypes.data_as(ctypes.c_void_p), oks)
        return outs, np.asarray(oks) == 0

    def decode_files(self, paths: List[str], canvas: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """[n] file paths → ([n, canvas, canvas, 3] uint8, [n] ok mask)."""
        n = len(paths)
        outs = np.empty((n, canvas, canvas, 3), np.uint8)
        oks = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        with self._submit_lock:
            self._lib.vt_pool_decode_files(
                self._pool, n, arr, canvas,
                outs.ctypes.data_as(ctypes.c_void_p), oks)
        return outs, np.asarray(oks) == 0
