"""Pallas depthwise kernel parity (interpret mode — no TPU needed).

Reference: the grouped-conv emission of the same [k,k,1,C] weights
(``lax.conv_general_dilated`` with ``feature_group_count=C``), i.e. the
MBConv depthwise stage of ``efficientnet_pytorch`` backbones
(reference ``backbone_models.py:92-124``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vince_tpu.ops.pallas import depthwise_kernel as dk


def _ref_dw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize(
    "n,h,wd,c,k",
    [
        (2, 16, 16, 32, 3),     # C < 128 (lane-masked)
        (2, 12, 12, 144, 3),    # C not a multiple of 128
        (4, 9, 9, 240, 5),      # k=5, nb batching (blocks are small)
        (2, 7, 7, 256, 3),
    ],
)
def test_forward_matches_grouped_conv(n, h, wd, c, k):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, h, wd, c), jnp.float32)
    w = jax.random.normal(kw, (k, k, 1, c), jnp.float32) * 0.1
    assert dk.kernel_supported(x.shape, k, 1)
    y = dk.depthwise_conv_pallas(x, w, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_dw(x, w)),
                               atol=1e-5, rtol=1e-5)


def test_grad_matches_grouped_conv():
    n, h, wd, c, k = 2, 10, 10, 48, 3
    kx, kw, kc = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (n, h, wd, c), jnp.float32)
    w = jax.random.normal(kw, (k, k, 1, c), jnp.float32) * 0.1
    ct = jax.random.normal(kc, (n, h, wd, c), jnp.float32)

    def loss_pallas(x, w):
        return jnp.sum(dk.depthwise_conv_pallas(x, w, True) * ct)

    def loss_ref(x, w):
        return jnp.sum(_ref_dw(x, w) * ct)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-4, rtol=1e-4)


def test_supported_predicate_bounds():
    assert not dk.kernel_supported((2, 16, 16, 32), 3, 2)   # stride 2
    assert not dk.kernel_supported((2, 16, 16, 32), 4, 1)   # even k
    assert not dk.kernel_supported((2, 2, 2, 32), 5, 1)     # smaller than k
    # one 112²-image at C=96 (a stride-2 site's input scale) busts the budget
    assert not dk.kernel_supported((128, 112, 112, 96), 3, 1)
