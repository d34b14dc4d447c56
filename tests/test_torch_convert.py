"""Torch→JAX conversion: a synthetic torchvision-named state dict must load
into the flax ResNet18/VinceEncoder trees with exactly matching structure and
correctly transposed values, and the model must run with the loaded weights."""

import jax
import jax.numpy as jnp
import numpy as np

from vince_tpu.models import resnet
from vince_tpu.models.vince_model import VinceEncoder
from vince_tpu.utils.pytree import flatten_dict
from vince_tpu.utils.torch_convert import (
    convert_resnet_state_dict,
    convert_vince_state_dict,
)

def _torch_resnet18_state_dict(rng):
    """Build a torchvision-resnet18-shaped state dict (names + shapes)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".num_batches_tracked"] = np.int64(7)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 64, 128, 256, 512]
    for layer in range(1, 5):
        c_in, c_out = channels[layer - 1], channels[layer]
        for block in range(2):
            p = f"layer{layer}.{block}"
            first_in = c_in if block == 0 else c_out
            conv(p + ".conv1", c_out, first_in, 3)
            bn(p + ".bn1", c_out)
            conv(p + ".conv2", c_out, c_out, 3)
            bn(p + ".bn2", c_out)
            if block == 0 and (c_in != c_out):
                conv(p + ".downsample.0", c_out, c_in, 1)
                bn(p + ".downsample.1", c_out)
    sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd

def test_resnet18_conversion_structure_and_values():
    rng = np.random.RandomState(0)
    sd = _torch_resnet18_state_dict(rng)
    params, stats = convert_resnet_state_dict(sd)

    model = resnet.ResNet18()
    ref = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)))
    ref_p = flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, ref["params"]))
    got_p = flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, params))
    assert set(ref_p) == set(got_p), (
        set(ref_p) - set(got_p), set(got_p) - set(ref_p)
    )
    for k in ref_p:
        assert tuple(ref_p[k]) == tuple(got_p[k]), (k, ref_p[k], got_p[k])

    ref_s = flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, ref["batch_stats"]))
    got_s = flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, stats))
    assert set(ref_s) == set(got_s)

    # value check: conv1 kernel is OIHW→HWIO
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["kernel"]), sd["conv1.weight"].transpose(2, 3, 1, 0)
    )
    # model runs with the converted weights
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 1, 1, 512)
    assert np.isfinite(np.asarray(out)).all()

def test_vince_checkpoint_conversion():
    rng = np.random.RandomState(1)
    base = _torch_resnet18_state_dict(rng)
    sd = {"feature_extractor.module.model." + k: v for k, v in base.items()}
    sd["embedding.0.weight"] = rng.randn(512, 512).astype(np.float32)
    sd["embedding.0.bias"] = rng.randn(512).astype(np.float32)
    sd["embedding.2.weight"] = rng.randn(64, 512).astype(np.float32)
    sd["embedding.2.bias"] = rng.randn(64).astype(np.float32)
    sd["imagenet_decoders.0.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["imagenet_decoders.0.bias"] = rng.randn(1000).astype(np.float32)
    sd["imagenet_decoders.1.0.weight"] = rng.randn(512, 512).astype(np.float32)
    sd["imagenet_decoders.1.0.bias"] = rng.randn(512).astype(np.float32)
    sd["imagenet_decoders.1.2.weight"] = rng.randn(1000, 512).astype(np.float32)
    sd["imagenet_decoders.1.2.bias"] = rng.randn(1000).astype(np.float32)

    params, stats = convert_vince_state_dict(sd)
    model = VinceEncoder(backbone_name="ResNet18", embed_size=64, use_imagenet_decoders=True)
    ref = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)),
        method=VinceEncoder.full_init,
    )
    ref_p = set(flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, ref["params"])))
    got_p = set(flatten_dict(jax.tree_util.tree_map(lambda x: x.shape, params)))
    # pool (AveragePool) has no params; everything else must match exactly
    assert ref_p == got_p, (ref_p - got_p, got_p - ref_p)

    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.ones((2, 32, 32, 3)), train=False
    )
    assert out["embeddings"].shape == (2, 64)
    # linear layers transposed: y = W x ⇒ kernel = W.T
    np.testing.assert_array_equal(
        np.asarray(params["embedding"]["fc1"]["kernel"]), sd["embedding.0.weight"].T
    )

def test_vince_checkpoint_conversion_efficientnet_backbone():
    """convert_vince_state_dict must route `_conv_stem`/`_blocks` keys through
    the EfficientNet converter (reference VinceModel with an EfficientNet
    backbone, backbone_models.py:92-124)."""
    import numpy as np
    from vince_tpu.utils.torch_convert import convert_vince_state_dict

    rng = np.random.RandomState(0)
    pre = "feature_extractor.module.model."
    sd = {
        pre + "_conv_stem.weight": rng.randn(32, 3, 3, 3).astype(np.float32),
        pre + "_bn0.weight": np.ones(32, np.float32),
        pre + "_bn0.bias": np.zeros(32, np.float32),
        pre + "_bn0.running_mean": np.zeros(32, np.float32),
        pre + "_bn0.running_var": np.ones(32, np.float32),
        pre + "_blocks.0._depthwise_conv.weight": rng.randn(32, 1, 3, 3).astype(np.float32),
        pre + "_blocks.0._bn1.weight": np.ones(32, np.float32),
        pre + "_blocks.0._bn1.bias": np.zeros(32, np.float32),
        pre + "_blocks.0._bn1.running_mean": np.zeros(32, np.float32),
        pre + "_blocks.0._bn1.running_var": np.ones(32, np.float32),
        pre + "_blocks.0._se_reduce.weight": rng.randn(8, 32, 1, 1).astype(np.float32),
        pre + "_blocks.0._se_reduce.bias": np.zeros(8, np.float32),
        pre + "_blocks.0._se_expand.weight": rng.randn(32, 8, 1, 1).astype(np.float32),
        pre + "_blocks.0._se_expand.bias": np.zeros(32, np.float32),
        pre + "_blocks.0._project_conv.weight": rng.randn(16, 32, 1, 1).astype(np.float32),
        pre + "_blocks.0._bn2.weight": np.ones(16, np.float32),
        pre + "_blocks.0._bn2.bias": np.zeros(16, np.float32),
        pre + "_blocks.0._bn2.running_mean": np.zeros(16, np.float32),
        pre + "_blocks.0._bn2.running_var": np.ones(16, np.float32),
        "embedding.0.weight": rng.randn(64, 1280).astype(np.float32),
        "embedding.0.bias": np.zeros(64, np.float32),
        "embedding.2.weight": rng.randn(64, 64).astype(np.float32),
    }
    params, stats = convert_vince_state_dict(sd)
    bb = params["backbone"]
    assert bb["stem_conv"]["kernel"].shape == (3, 3, 3, 32)
    assert bb["block_0"]["depthwise_conv"]["kernel"].shape == (3, 3, 1, 32)
    assert bb["block_0"]["se"]["reduce"]["kernel"].shape == (1, 1, 32, 8)
    assert bb["block_0"]["project_conv"]["kernel"].shape == (1, 1, 32, 16)
    assert stats["backbone"]["stem_bn"]["mean"].shape == (32,)
    assert stats["backbone"]["block_0"]["project_bn"]["var"].shape == (16,)
    assert params["embedding"]["fc1"]["kernel"].shape == (1280, 64)
    np.testing.assert_array_equal(
        bb["stem_conv"]["kernel"],
        sd[pre + "_conv_stem.weight"].transpose(2, 3, 1, 0),
    )
