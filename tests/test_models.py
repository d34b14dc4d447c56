"""Backbone + encoder shape/param sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vince_tpu.models import resnet
from vince_tpu.models.vince_model import (
    VinceEncoder,
    jigsaw_patchify,
    random_jigsaw_perms,
    split_vince_params,
)
from vince_tpu.utils.pytree import tree_size


def _init(model, shape, train=True, **kw):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=train, **kw)
    return variables, x


def test_resnet18_shapes_and_params():
    m = resnet.ResNet18()
    variables, x = _init(m, (2, 64, 64, 3))
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 2, 2, 512)  # 64/32 = 2
    # torchvision resnet18 feature extractor (no fc) = 11,176,512 params
    n_params = tree_size(variables["params"])
    assert n_params == 11_176_512, n_params


def test_resnet50_shapes_and_params():
    m = resnet.ResNet50()
    variables, x = _init(m, (1, 64, 64, 3))
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 2, 2, 2048)
    # torchvision resnet50 without fc = 23,508,032 params
    n_params = tree_size(variables["params"])
    assert n_params == 23_508_032, n_params


def test_dilated_resnet_preserves_resolution():
    m = resnet.ResNet18SiamFCDilated()
    variables, x = _init(m, (1, 64, 64, 3))
    y = m.apply(variables, x, train=False)
    # stride 32 → 8 with layer3/4 dilated (reference backbone_models.py:78-89)
    assert y.shape == (1, 8, 8, 512)


def test_batchnorm_updates_stats_in_train_mode():
    m = resnet.ResNet18()
    variables, x = _init(m, (2, 32, 32, 3))
    x = jnp.ones((2, 32, 32, 3))
    _, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vince_encoder_forward():
    m = VinceEncoder(backbone_name="ResNet18", embed_size=64)
    x = jax.random.normal(jax.random.PRNGKey(42), (2, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out["embeddings"].shape == (2, 64)
    assert out["extracted_features"].shape == (2, 512)
    norms = jnp.linalg.norm(out["embeddings"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_vince_encoder_attention_pool():
    m = VinceEncoder(backbone_name="ResNet18", embed_size=32, use_attention=True)
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x, train=False)
    assert out["attention_masks"].shape == (2, 2, 2, 1)
    s = jnp.sum(out["attention_masks"], axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)


def test_jigsaw_patchify_and_forward():
    x = jnp.arange(2 * 66 * 66 * 3, dtype=jnp.float32).reshape(2, 66, 66, 3)
    patches = jigsaw_patchify(x)
    assert patches.shape == (18, 22, 22, 3)
    # top-left patch must equal top-left crop
    np.testing.assert_array_equal(np.asarray(patches[0]), np.asarray(x[0, :22, :22]))

    m = VinceEncoder(backbone_name="ResNet18", embed_size=32, jigsaw=True)
    perms = random_jigsaw_perms(jax.random.PRNGKey(1), 2)
    variables = m.init({"params": jax.random.PRNGKey(0)}, patches, jigsaw=True, jigsaw_perm=perms)
    out = m.apply(variables, patches, train=False, jigsaw=True, jigsaw_perm=perms)
    assert out["embeddings"].shape == (2, 32)


def test_imagenet_decoders():
    m = VinceEncoder(backbone_name="ResNet18", embed_size=32, use_imagenet_decoders=True)
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, method=VinceEncoder.full_init)
    feats = jnp.zeros((2, 512))
    l0, l1 = m.apply(variables, feats, method=VinceEncoder.imagenet_logits)
    assert l0.shape == (2, 1000) and l1.shape == (2, 1000)

    tracked, rest = split_vince_params(variables["params"])
    assert set(rest) == {"imagenet_decoder_0", "imagenet_decoder_1"}
    assert "backbone" in tracked and "embedding" in tracked


@pytest.mark.slow
def test_efficientnet_b0_shapes():
    from vince_tpu.models.efficientnet import EfficientNetB0

    m = EfficientNetB0()
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 2, 2, 1280)


def test_s2d_stem_matches_conv7():
    """Space-to-depth stem must be mathematically identical to the direct
    7x7-s2 conv, with an identical param tree (checkpoint/converter compat)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vince_tpu.models.resnet import StemConvS2D
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    direct = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     use_bias=False, name="conv1")
    s2d = StemConvS2D(16, name="conv1")
    pv = direct.init(rng, x)
    y1 = direct.apply(pv, x)
    # same param tree → the direct conv's params drop straight in
    assert jax.tree_util.tree_structure(pv) == jax.tree_util.tree_structure(
        s2d.init(rng, x)
    )
    y2 = s2d.apply(pv, x)
    assert y1.shape == y2.shape == (2, 32, 32, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["expand", "all"])
def test_bn_fold_matches_unfolded(mode):
    """Derived-stat BN folding (resnet.folded_dot_bn) must be mathematically
    identical to Conv1x1+BatchNorm: same param tree, same train/eval forward,
    same gradients, same running-stat updates (it is the same function of the
    same parameters, reformulated to avoid the pre-norm HBM round trip)."""
    base = resnet.ResNet50(bn_momentum=0.9)
    folded = resnet.ResNet50(bn_momentum=0.9, bn_fold=mode)
    # 64² input / batch 4 keeps layer4's per-channel stats non-degenerate
    # (at 32² the last stage sees n=2 rows and BN γ-grads of near-constant
    # channels are f32 cancellation noise in BOTH paths)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(
        folded.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    ) == jax.tree_util.tree_structure(variables)

    # train-mode forward + batch_stats updates. Tolerance note: both paths
    # compute var as E[y²]−μ² in f32 (flax's own formulation) by different
    # reduction orders; at near-constant channels that difference is
    # cancellation noise amplified by rsqrt — a thin tail of elements
    # differing by ~1e-3 is inherent, not a folding error.
    y1, m1 = base.apply(variables, x, train=True, mutable=["batch_stats"])
    y2, m2 = folded.apply(variables, x, train=True, mutable=["batch_stats"])
    d = np.abs(np.asarray(y1) - np.asarray(y2))
    assert d.max() < 5e-3 and d.mean() < 1e-4, (d.max(), d.mean())
    for (p1, s1), (p2, s2) in zip(
        jax.tree_util.tree_leaves_with_path(m1["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(m2["batch_stats"]),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3, rtol=1e-2)

    # gradients (exact BN gradients — same function, reformulated)
    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return (out.astype(jnp.float32) ** 2).mean()

    g1 = jax.grad(lambda p: loss(base, p))(variables["params"])
    g2 = jax.grad(lambda p: loss(folded, p))(variables["params"])
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g2),
    ):
        assert p1 == p2
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1e-6)
        dg = np.abs(np.asarray(a) - np.asarray(b)) / scale
        assert dg.max() < 2e-2 and dg.mean() < 1e-3, (str(p1), dg.max(), dg.mean())

    # eval mode (classic inference folding from running stats)
    e1 = base.apply(variables, x, train=False)
    e2 = folded.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-3, rtol=1e-3)


def test_folded_dot_bn_single_layer_exact():
    """One folded layer vs Conv1x1+BatchNorm on well-conditioned input:
    f32-tight parity (the full-network test tolerates only the unfolded
    path's own variance-cancellation noise)."""
    import flax.linen as nn
    from vince_tpu.models.resnet import Conv1x1, FoldCfg, folded_dot_bn

    class Unfolded(nn.Module):
        @nn.compact
        def __call__(self, x, res):
            y = Conv1x1(96, name="c")(x)
            y = nn.BatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5, name="b"
            )(y)
            return nn.relu(y + res)

    class Folded(nn.Module):
        @nn.compact
        def __call__(self, x, res):
            cfg = FoldCfg(True, 0.9, 1e-5, jnp.float32, None)
            return folded_dot_bn(
                x, 96, cfg, conv_name="c", bn_name="b", act=nn.relu, residual=res
            )

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 48), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 96), jnp.float32)
    variables = Unfolded().init({"params": jax.random.PRNGKey(0)}, x, res)
    assert jax.tree_util.tree_structure(
        Folded().init({"params": jax.random.PRNGKey(0)}, x, res)
    ) == jax.tree_util.tree_structure(variables)
    y1, m1 = Unfolded().apply(variables, x, res, mutable=["batch_stats"])
    y2, m2 = Folded().apply(variables, x, res, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["b"]["var"]),
        np.asarray(m2["batch_stats"]["b"]["var"]), atol=1e-5, rtol=1e-4,
    )

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, res, mutable=["batch_stats"],
        )
        return (out ** 2).mean()

    g1 = jax.grad(lambda p: loss(Unfolded(), p))(variables["params"])
    g2 = jax.grad(lambda p: loss(Folded(), p))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        ),
        g1, g2,
    )


def test_efficientnet_bn_fold_matches_unfolded():
    """EfficientNet expand/head BN folding parity (expand_conv + head_conv
    are the Cin<Cout dots where derived-stat folding pays)."""
    from vince_tpu.models import efficientnet

    base = efficientnet.EfficientNetB0()
    folded = efficientnet.EfficientNetB0(bn_fold="expand")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(
        folded.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    ) == jax.tree_util.tree_structure(variables)
    y1, m1 = base.apply(variables, x, train=True, mutable=["batch_stats"])
    y2, m2 = folded.apply(variables, x, train=True, mutable=["batch_stats"])
    d = np.abs(np.asarray(y1) - np.asarray(y2))
    assert d.max() < 5e-3 and d.mean() < 1e-4, (d.max(), d.mean())
    e1 = base.apply(variables, x, train=False)
    e2 = folded.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize(
    "kernel,strides,size", [(3, 1, 16), (3, 2, 15), (5, 1, 9), (5, 2, 14)]
)
def test_depthwise_tap_matches_grouped_conv(kernel, strides, size):
    """DepthwiseConvTap == nn.Conv(feature_group_count=C, padding=SAME):
    same param tree, same math (incl. TF-SAME asymmetric stride-2 padding)."""
    import flax.linen as nn

    from vince_tpu.models.efficientnet import DepthwiseConvTap

    c = 24
    conv = nn.Conv(c, (kernel, kernel), strides=(strides, strides),
                   padding="SAME", feature_group_count=c, use_bias=False)
    tap = DepthwiseConvTap(kernel, strides=strides)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, size, size, c), jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["kernel"].shape == (kernel, kernel, 1, c)
    assert jax.tree_util.tree_structure(
        tap.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(variables)
    y1 = conv.apply(variables, x)
    y2 = tap.apply(variables, x)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5, rtol=1e-5)


def test_efficientnet_dw_tap_matches_conv():
    """Whole-B0 parity between the grouped-conv and tap-sum depthwise paths
    (shared params -- dw_kind must not change the tree)."""
    from vince_tpu.models import efficientnet

    base = efficientnet.EfficientNetB0()
    tap = efficientnet.EfficientNetB0(dw_kind="tap")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(
        tap.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    ) == jax.tree_util.tree_structure(variables)
    y1, _ = base.apply(variables, x, train=True, mutable=["batch_stats"])
    y2, _ = tap.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4, rtol=1e-3)


def test_efficientnet_se_fold_matches_mul():
    """Whole-B0 parity between the elementwise SE gate and the gate folded
    into the project conv's per-sample weights ((y.diag(s))W == y(diag(s)W);
    se_kind must not change the param tree), including gradients."""
    from vince_tpu.models import efficientnet

    base = efficientnet.EfficientNetB0()
    fold = efficientnet.EfficientNetB0(se_kind="fold")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(
        fold.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    ) == jax.tree_util.tree_structure(variables)
    y1, _ = base.apply(variables, x, train=True, mutable=["batch_stats"])
    y2, _ = fold.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4, rtol=1e-3)

    def loss(model):
        def f(params):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(y ** 2)
        return f

    g1 = jax.grad(loss(base))(variables["params"])
    g2 = jax.grad(loss(fold))(variables["params"])

    # The two formulations are algebraically identical but accumulate in a
    # different order, so near-zero (heavily cancelled) gradient entries —
    # e.g. BN bias grads that sum almost-cancelling upstream terms — can
    # differ by large *relative* amounts while the gradient as a whole
    # matches to f32 precision. Compare with scale-aware metrics: global
    # relative L2, plus per-leaf max error bounded by the *global* gradient
    # magnitude (per-leaf scaling would spuriously fail the cancelled leaves).
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    sq_diff = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(l1, l2))
    sq_ref = sum(float(jnp.sum(a ** 2)) for a in l1)
    rel_l2 = (sq_diff / max(sq_ref, 1e-30)) ** 0.5
    assert rel_l2 < 1e-3, f"global grad rel-L2 {rel_l2:.3e} >= 1e-3"

    gscale = max(float(jnp.max(jnp.abs(a))) for a in l1)

    def assert_leaf(path, a, b):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-3 * gscale, (
            f"{jax.tree_util.keystr(path)}: max|g1-g2|={err:.3e} "
            f">= 1e-3*global_scale ({gscale:.3e})"
        )

    jax.tree_util.tree_map_with_path(assert_leaf, g1, g2)
