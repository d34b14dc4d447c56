#!/usr/bin/env python
"""Microbench: Pallas affine_relu_dot_moments vs the XLA sequence it replaces
(normalize+relu materialize → main dot + moment dots), at R50 folded-site
shapes, on the real chip. Also asserts value parity kernel-vs-XLA.

Timing per CLAUDE.md: chained reps inside one jit, value-fetch, subtract RT.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))

from vince_tpu.ops.pallas.folded_dot_kernel import (
    _reference, affine_relu_dot_moments,
)

REPS = 12
PEAK_BW = 819e9


def timed(fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jax.device_get(out))
    t0 = time.time()
    for _ in range(3):
        np.asarray(jax.device_get(out))
    rt = (time.time() - t0) / 3
    t0 = time.time()
    out = jfn(*args)
    np.asarray(jax.device_get(out))
    return (time.time() - t0 - rt) / REPS


def chain(impl, y, a, b, w):
    """Serialize reps via a data dependence on s1 (cheap scalar feedback)."""

    def fn(y, a, b, w):
        acc = 0.0
        aa = a
        for _ in range(REPS):
            out, s1, s2 = impl(y, aa, b, w)
            acc += s1[0] + out[0, 0].astype(jnp.float32) + s2[0, 0]
            aa = a + s1[0] * 1e-30
        return acc

    return fn


def grad_chain(impl, y, a, b, w):
    def loss(y, a, b, w):
        out, s1, s2 = impl(y, a, b, w)
        return (jnp.sum(out.astype(jnp.float32) * 1e-6)
                + jnp.sum(s1) * 1e-6 + jnp.sum(s2) * 1e-9)

    def fn(y, a, b, w):
        acc = 0.0
        yy = y
        for _ in range(REPS):
            g = jax.grad(loss, argnums=(0, 1, 3))(yy, a, b, w)
            v = g[1][0]
            acc += v
            yy = y + (v * 1e-30).astype(y.dtype)
        return acc

    return fn


def main():
    rng = np.random.RandomState(0)
    shapes = [
        ("s2 conv3 [100352,128]->512", 128 * 28 * 28, 128, 512),
        ("s3 conv3 [25088,256]->1024", 128 * 14 * 14, 256, 1024),
        ("s4 conv3 [6272,512]->2048", 128 * 7 * 7, 512, 2048),
    ]
    for name, m, c, f in shapes:
        y = jnp.asarray(rng.randn(m, c).astype(np.float32), jnp.bfloat16)
        a = jnp.asarray(np.abs(rng.randn(c)).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05)

        # value parity (single call, f32-ish tolerance for bf16 data)
        ro, rs1, rs2 = jax.jit(lambda *t: _reference(*t))(y, a, b, w.astype(y.dtype))
        po, ps1, ps2 = jax.jit(
            lambda yy, aa, bb, ww: affine_relu_dot_moments(yy, aa, bb, ww, True)
        )(y, a, b, w)
        np.testing.assert_allclose(
            np.asarray(po, np.float32), np.asarray(ro, np.float32), rtol=2e-2, atol=2e-2
        )
        np.testing.assert_allclose(np.asarray(ps1), np.asarray(rs1), rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(ps2), np.asarray(rs2), rtol=2e-2, atol=0.5
        )
        print(f"{name}: parity ok")

        bytes_min = (m * c + m * f) * 2 + c * f * 2
        for label, impl in (
            ("xla ", lambda yy, aa, bb, ww: _reference(yy, aa, bb, ww.astype(yy.dtype))),
            ("plls", lambda yy, aa, bb, ww: affine_relu_dot_moments(yy, aa, bb, ww, True)),
        ):
            t = timed(chain(impl, y, a, b, w), y, a, b, w)
            bw = bytes_min / t / 1e9
            print(f"  fwd {label}: {t*1e3:7.3f} ms  minBW {bw:5.0f} GB/s "
                  f"(floor {bytes_min/PEAK_BW*1e3:6.3f} ms)")
        for label, impl in (
            ("xla ", lambda yy, aa, bb, ww: _reference(yy, aa, bb, ww.astype(yy.dtype))),
            ("plls", lambda yy, aa, bb, ww: affine_relu_dot_moments(yy, aa, bb, ww, True)),
        ):
            t = timed(grad_chain(impl, y, a, b, w), y, a, b, w)
            print(f"  f+b {label}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
