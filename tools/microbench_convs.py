#!/usr/bin/env python
"""Per-op roofline microbench on the real chip: bare convs/dots at R50 stage
shapes, chained inside one jit (per CLAUDE.md methodology — value-fetch
timing, chained executions, subtract round trip). Ops are chained
shape-preservingly (conv Cin==Cout chains directly; 1x1 dots chain as
up/down projection pairs) so XLA cannot CSE the repetitions.

Answers: how close does XLA:TPU run each hot-shape op to the
max(FLOP, HBM) roofline — i.e., how much of the step's 62 GB/step traffic is
structural (operand footprints) vs emitter re-streaming.
"""
import os
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

PEAK_TF = 197e12
PEAK_BW = 819e9
REPS = 16


def timed(fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jax.device_get(out))  # compile+sync

    t0 = time.time()
    for _ in range(3):
        np.asarray(jax.device_get(out))
    rt = (time.time() - t0) / 3

    t0 = time.time()
    out = jfn(*args)
    np.asarray(jax.device_get(out))
    return time.time() - t0 - rt


def report(name, secs, flops, min_bytes):
    t = secs / REPS
    tf = flops / t / 1e12
    bw = min_bytes / t / 1e9
    floor = max(flops / PEAK_TF, min_bytes / PEAK_BW)
    print(f"{name:40s} {t*1e3:7.3f} ms  {tf:6.1f} TF/s ({tf/197*100:4.1f}%)  "
          f"minBW {bw:5.0f} GB/s  floor {floor*1e3:6.3f} ms  eff {floor/t*100:4.0f}%")


def main():
    rng = np.random.RandomState(0)

    def conv_case(n, h, w_, c):
        x = jnp.asarray(rng.randn(n, h, w_, c).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05, jnp.bfloat16)

        def fn(x, k):
            acc = x
            for _ in range(REPS):
                acc = jax.lax.conv_general_dilated(
                    acc, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return acc.ravel()[:8]

        flops = 2 * n * h * w_ * c * c * 9
        min_bytes = n * h * w_ * c * 2 * 2 + 9 * c * c * 2
        return fn, (x, k), flops, min_bytes

    def dot_pair_case(n, h, w_, c_small, c_big):
        x = jnp.asarray(rng.randn(n, h, w_, c_small).astype(np.float32), jnp.bfloat16)
        wu = jnp.asarray(rng.randn(c_small, c_big).astype(np.float32) * 0.05, jnp.bfloat16)
        wd = jnp.asarray(rng.randn(c_big, c_small).astype(np.float32) * 0.05, jnp.bfloat16)

        def fn(x, wu, wd):
            acc = x
            for _ in range(REPS):
                y = jax.lax.dot_general(acc, wu, (((3,), (0,)), ((), ())))
                acc = jax.lax.dot_general(y, wd, (((3,), (0,)), ((), ())))
            return acc.ravel()[:8]

        m = n * h * w_
        flops = 2 * (2 * m * c_small * c_big)  # up + down per rep
        min_bytes = m * (2 * c_small + 2 * c_big) * 2 + (wu.size + wd.size) * 2
        return fn, (x, wu, wd), flops, min_bytes

    cases = [
        ("s1 3x3 conv [128,56,56,64]", conv_case(128, 56, 56, 64)),
        ("s2 3x3 conv [128,28,28,128]", conv_case(128, 28, 28, 128)),
        ("s3 3x3 conv [128,14,14,256]", conv_case(128, 14, 14, 256)),
        ("s4 3x3 conv [128,7,7,512]", conv_case(128, 7, 7, 512)),
        ("s1 1x1 up/down 64<->256 @56^2", dot_pair_case(128, 56, 56, 64, 256)),
        ("s2 1x1 up/down 128<->512 @28^2", dot_pair_case(128, 28, 28, 128, 512)),
        ("s3 1x1 up/down 256<->1024 @14^2", dot_pair_case(128, 14, 14, 256, 1024)),
    ]
    for name, (fn, args, flops, min_bytes) in cases:
        secs = timed(fn, *args)
        report(name, secs, flops, min_bytes)


if __name__ == "__main__":
    main()
