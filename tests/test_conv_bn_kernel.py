"""Parity tests for the experimental fused affine+ReLU+conv3×3+stats kernel
(ops/pallas/conv_bn_kernel.py) — interpret mode vs the XLA reference, plus
the exact custom VJP vs autodiff of the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vince_tpu.ops.pallas import conv_bn_kernel as ck


@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 16), (1, 14, 7, 16, 8)])
def test_kernel_matches_reference_interpret(shape):
    n, h, w, c, f = shape
    rng = np.random.RandomState(0)
    y_prev = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c, f) * 0.1, jnp.float32)
    ref = ck._reference(y_prev, a, b, k)
    out = ck._pallas_impl(y_prev, a, b, k, interpret=True)
    for name, r, o in zip(["y", "s1", "s2"], ref, out):
        err = float(jnp.max(jnp.abs(r.astype(jnp.float32) - o.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        assert err < 1e-3 * scale + 1e-4, (name, err, scale)


@pytest.mark.parametrize("post_relu_input", [False, True])
def test_custom_vjp_matches_reference_autodiff(post_relu_input):
    """post_relu_input=True feeds an input with exact zeros (the identity-
    affine mode's real inputs): the ReLU tie-gradient convention must match
    between the custom VJP (strict >0 mask) and the reference (jax.nn.relu,
    derivative 0 at 0)."""
    n, h, w, c, f = 1, 8, 8, 8, 8
    rng = np.random.RandomState(1)
    y_prev = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    if post_relu_input:
        y_prev = jax.nn.relu(y_prev)  # ~half the entries exactly 0
    a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c, f) * 0.1, jnp.float32)

    def loss(fn, args):
        y, s1, s2 = fn(*args)
        return (y ** 2).mean() + (s1 * jnp.arange(f)).sum() * 1e-3 + (s2 * 1e-4).sum()

    g1 = jax.grad(lambda args: loss(ck.affine_conv3x3_stats, args))((y_prev, a, b, k))
    g2 = jax.grad(lambda args: loss(ck._reference, args))((y_prev, a, b, k))
    for name, x, y in zip(["y_prev", "a", "b", "k"], g1, g2):
        err = float(jnp.max(jnp.abs(x - y)))
        scale = float(jnp.max(jnp.abs(y))) + 1e-9
        assert err < 1e-4 * scale + 1e-5, (name, err, scale)


def test_supported_predicate():
    ok = jnp.zeros((2, 28, 28, 128), jnp.bfloat16)
    k_ok = jnp.zeros((3, 3, 128, 128), jnp.float32)
    assert ck.kernel_supported(ok, k_ok)
    assert not ck.kernel_supported(jnp.zeros((2, 56, 56, 64), jnp.bfloat16),
                                   jnp.zeros((3, 3, 64, 64), jnp.float32))
    assert not ck.kernel_supported(jnp.zeros((2, 56, 56, 128), jnp.bfloat16),
                                   jnp.zeros((3, 3, 128, 128), jnp.float32))
