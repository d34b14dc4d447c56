"""JAX→Torch export round-trip: export_vince_state_dict must be the exact
inverse of convert_vince_state_dict on real VinceEncoder trees (ResNet and
EfficientNet backbones, with and without the supervised decoders), producing
reference-format names (``feature_extractor.module.model.*`` etc. —
reference ``models/vince_model.py:26-90``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vince_tpu.models.vince_model import VinceEncoder
from vince_tpu.utils.pytree import flatten_dict
from vince_tpu.utils.torch_convert import convert_vince_state_dict
from vince_tpu.utils.torch_export import export_vince_state_dict


def _init_encoder(backbone, use_decoders=False, jigsaw=False, use_attention=False):
    enc = VinceEncoder(
        backbone_name=backbone, embed_size=16,
        use_imagenet_decoders=use_decoders, num_imagenet_classes=10,
        jigsaw=jigsaw, use_attention=use_attention,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False,
                         method=VinceEncoder.full_init)
    return variables["params"], variables.get("batch_stats", {})


def _assert_tree_roundtrip(params, stats, rt_params, rt_stats):
    f0, f1 = flatten_dict(params), flatten_dict(rt_params)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]),
                                   atol=1e-6, err_msg=str(k))
    s0, s1 = flatten_dict(stats), flatten_dict(rt_stats)
    assert set(s0) == set(s1)
    for k in s0:
        np.testing.assert_allclose(np.asarray(s0[k]), np.asarray(s1[k]),
                                   atol=1e-6, err_msg=str(k))


@pytest.mark.parametrize("backbone", ["ResNet18", "ResNet50", "EfficientNetB0"])
def test_export_roundtrip(backbone):
    params, stats = _init_encoder(backbone)
    sd = export_vince_state_dict(params, stats)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    # reference naming: backbone under the DataParallel/Backbone prefixes
    assert any(k.startswith("feature_extractor.module.model.") for k in sd)
    assert "embedding.0.weight" in sd and "embedding.2.weight" in sd
    rt_params, rt_stats = convert_vince_state_dict(sd)
    _assert_tree_roundtrip(params, stats, rt_params, rt_stats)


def test_export_roundtrip_with_decoders():
    params, stats = _init_encoder("ResNet18", use_decoders=True)
    sd = export_vince_state_dict(params, stats)
    assert "imagenet_decoders.0.weight" in sd
    assert "imagenet_decoders.1.0.weight" in sd
    assert "imagenet_decoders.1.2.weight" in sd
    rt_params, rt_stats = convert_vince_state_dict(sd)
    _assert_tree_roundtrip(params, stats, rt_params, rt_stats)


def test_export_roundtrip_with_jigsaw():
    """PIRL jigsaw heads map to the reference jigsaw_linear /
    jigsaw_embedding.{0,2} naming (vince_model.py:43-49) and round-trip."""
    params, stats = _init_encoder("ResNet18", jigsaw=True)
    sd = export_vince_state_dict(params, stats)
    assert "jigsaw_linear.weight" in sd
    assert "jigsaw_embedding.0.weight" in sd
    assert "jigsaw_embedding.2.weight" in sd
    rt_params, rt_stats = convert_vince_state_dict(sd)
    _assert_tree_roundtrip(params, stats, rt_params, rt_stats)


def test_export_roundtrip_with_attention_pool():
    """--use-attention checkpoints round-trip: the 1×1 C→1 logits conv
    exports under average_layers.* (reference vince_model.py:31) in torch
    conv layout and the shape-driven converter maps it back exactly."""
    params, stats = _init_encoder("ResNet18", use_attention=True)
    sd = export_vince_state_dict(params, stats)
    assert sd["average_layers.attention.weight"].shape == (1, 512, 1, 1)
    assert sd["average_layers.attention.bias"].shape == (1,)
    rt_params, rt_stats = convert_vince_state_dict(sd)
    _assert_tree_roundtrip(params, stats, rt_params, rt_stats)


def test_attention_pool_convert_refuses_unknown_shapes():
    """average_layers.* tensors that are NOT a single 1×1 C→1 map (a richer
    dg_util architecture than ours) must be skipped, not guessed at."""
    params, stats = _init_encoder("ResNet18")
    sd = export_vince_state_dict(params, stats)
    sd["average_layers.fc1.weight"] = np.zeros((256, 512, 1, 1), np.float32)
    sd["average_layers.fc2.weight"] = np.zeros((1, 256, 1, 1), np.float32)
    rt_params, _ = convert_vince_state_dict(sd)
    assert "pool" not in rt_params


def test_export_torch_conv_layout():
    """Exported conv weights are [O, I, kh, kw] (torch layout)."""
    params, stats = _init_encoder("ResNet18")
    sd = export_vince_state_dict(params, stats)
    w = sd["feature_extractor.module.model.conv1.weight"]
    assert w.shape == (64, 3, 7, 7)
    k = np.asarray(params["backbone"]["conv1"]["kernel"])  # [7,7,3,64]
    np.testing.assert_allclose(w, k.transpose(3, 2, 0, 1), atol=1e-6)


def test_export_cli_roundtrip(tmp_path):
    """Orbax checkpoint → export CLI → .pt → converter CLI shapes align."""
    torch = pytest.importorskip("torch")
    import flax

    from tools.export_reference_checkpoint import main as export_main
    from vince_tpu.utils.checkpoint import CheckpointManager

    params, stats = _init_encoder("ResNet18")

    @flax.struct.dataclass
    class MiniState:
        step: jax.Array
        params: dict
        batch_stats: dict
        key_params: dict
        key_batch_stats: dict

    state = MiniState(
        step=jnp.asarray(3, jnp.int32), params=params, batch_stats=stats,
        key_params=jax.tree_util.tree_map(jnp.copy, params),
        key_batch_stats=jax.tree_util.tree_map(jnp.copy, stats),
    )
    ckpt_dir = tmp_path / "ckpts"
    mgr = CheckpointManager(str(ckpt_dir), None)
    mgr.save(3, jax.device_get(state))
    mgr.close()

    out = tmp_path / "exported.pt"
    export_main(["--checkpoint-dir", str(ckpt_dir), "--output", str(out)])
    sd = torch.load(str(out), map_location="cpu", weights_only=False)
    assert sd["feature_extractor.module.model.conv1.weight"].shape == (64, 3, 7, 7)
    rt_params, rt_stats = convert_vince_state_dict(sd)
    _assert_tree_roundtrip(params, stats, rt_params, rt_stats)
