#!/usr/bin/env python
"""Host decode-path bench: cv2 pipeline vs the native C++ decoder.

Measures decoded frames/s for the read_image contract (JPEG → RGB uint8
canvas) at two source sizes:
  - "small"  (320×240 — R2V2-like pre-shrunk frames)
  - "large"  (1280×720 — Kinetics-like raw frames, where the native path's
    DCT-domain scaled decode skips most of the IDCT work)

Env: DECODE_CANVAS (default 256), DECODE_N (default 200),
DECODE_THREADS (default cpu count — pool width for the native batch path).
"""

import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vince_tpu import native  # noqa: E402

CANVAS = int(os.environ.get("DECODE_CANVAS", 256))
N = int(os.environ.get("DECODE_N", 200))


def make_jpeg(h, w, seed):
    rng = np.random.RandomState(seed)
    img = cv2.resize(rng.randint(0, 256, (24, 32, 3), np.uint8), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    return enc.tobytes()


def bench(fn, n, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n / best


def main():
    cv2.setNumThreads(0)  # loader workers run single-threaded decode
    if not native.available():
        print("native decode unavailable (no g++/libjpeg); nothing to compare")
        return

    for label, (h, w) in [("small 320x240", (240, 320)), ("large 1280x720", (720, 1280))]:
        datas = [make_jpeg(h, w, i) for i in range(N)]

        def cv2_loop():
            for d in datas:
                img = cv2.imdecode(np.frombuffer(d, np.uint8), cv2.IMREAD_COLOR)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                cv2.resize(img, (CANVAS, CANVAS), interpolation=cv2.INTER_LINEAR)

        def native_loop():
            for d in datas:
                native.decode_jpeg(d, CANVAS)

        pool = native.DecodePool()

        def native_pool():
            pool.decode(datas, CANVAS)

        r_cv = bench(cv2_loop, N)
        r_na = bench(native_loop, N)
        r_po = bench(native_pool, N)
        pool.close()
        print(f"{label}: cv2 {r_cv:8.0f} f/s | native {r_na:8.0f} f/s "
              f"({r_na / r_cv:.2f}x) | native pool({pool.n_threads}t) "
              f"{r_po:8.0f} f/s ({r_po / r_cv:.2f}x)")


if __name__ == "__main__":
    main()
