"""Fused bn2→relu→conv3 kernel path (ops/pallas/folded_dot_kernel +
resnet.fused_bn_relu_folded_dot): identical params/math to the standard
folded path — forward, gradients, and BN running stats must match."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.models.resnet import ResNet50
from vince_tpu.ops.pallas.folded_dot_kernel import (
    _reference,
    affine_relu_dot_moments,
)


def _flat(tree):
    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def test_custom_vjp_matches_autodiff():
    """The hand-written VJP must equal autodiff of the reference math."""
    rng = np.random.RandomState(0)
    m, c, f = 256, 128, 256
    y = jnp.asarray(rng.randn(m, c).astype(np.float32))
    a = jnp.asarray(np.abs(rng.randn(c)).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.05)

    def loss_ref(y, a, b, w):
        out, s1, s2 = _reference(y, a, b, w)
        return (jnp.sum(out * 0.3) + jnp.sum(s1 * 0.7) + jnp.sum(s2 * 0.01))

    def loss_k(y, a, b, w):
        out, s1, s2 = affine_relu_dot_moments(y, a, b, w, False)
        return (jnp.sum(out * 0.3) + jnp.sum(s1 * 0.7) + jnp.sum(s2 * 0.01))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(y, a, b, w)
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(y, a, b, w)
    for r, k in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(r), np.asarray(k), rtol=1e-4, atol=1e-5)


def test_resnet_fold_kernel_path_parity(cpu_devices):
    """fold_kernel=True (reference dispatch on CPU) bit-matches the standard
    folded forward; grads and BN running stats match within float tolerance;
    param trees identical."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))

    def run(fold_kernel):
        m = ResNet50(bn_fold="expand", fold_kernel=fold_kernel)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)

        def loss(p):
            o, mu = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6, (o, mu)

        (l, (o, mu)), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return o, l, g, mu["batch_stats"]

    o1, l1, g1, bs1 = run(False)
    o2, l2, g2, bs2 = run(True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    f1, f2 = _flat(g1), _flat(g2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=5e-3, atol=1e-5, err_msg=k)
    b1, b2 = _flat(bs1), _flat(bs2)
    assert set(b1) == set(b2)
    for k in b1:
        np.testing.assert_allclose(b1[k], b2[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_eval_mode_matches_standard_path(cpu_devices):
    """Eval (running-stat) forward through the fused function equals the
    classic folded eval path."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    m1 = ResNet50(bn_fold="expand", fold_kernel=False)
    m2 = ResNet50(bn_fold="expand", fold_kernel=True)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)
