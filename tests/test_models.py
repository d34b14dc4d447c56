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
