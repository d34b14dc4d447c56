"""JAX→Torch weight export: the inverse of ``utils/torch_convert.py``.

Emits a reference-format ``VinceModel`` state dict (DataParallel naming:
``feature_extractor.module.model.*`` for the backbone — reference
``models/vince_model.py:26,35`` wraps the torchvision/efficientnet model in
``Backbone`` then ``DataParallel`` — plus ``embedding.{0,2}`` for the
projection MLP, reference ``vince_model.py:38-42``, and
``imagenet_decoders.{0,1.*}`` heads, ``:79-90``), so checkpoints trained
here can flow back into the reference stack (or any torch MoCo-style
consumer). Round-trip (export → ``convert_vince_state_dict``) is
tested exactly.

The torchvision classifier head (``fc.*``) is not part of ``VinceEncoder``
and is omitted; the reference's ``pt_util.restore`` is partial-load
tolerant (its ``saved_variable_prefix``/``new_variable_prefix`` machinery
exists precisely for prefix-mismatched checkpoints).

Layout maps (inverse of torch_convert):
  - kernel [kh, kw, I, O]  →  conv weight [O, I, kh, kw]
  - kernel [I, O]          →  linear weight [O, I]
  - scale/bias             →  bn weight/bias
  - mean/var               →  bn running_mean/var (+ zero num_batches_tracked)
"""

import re
from typing import Dict, Optional

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv_w(kernel) -> np.ndarray:
    return _np(kernel).transpose(3, 2, 0, 1)


def _emit_bn(out: Dict, torch_name: str, p: Dict, s: Optional[Dict]):
    out[torch_name + ".weight"] = _np(p["scale"])
    out[torch_name + ".bias"] = _np(p["bias"])
    if s is not None:
        out[torch_name + ".running_mean"] = _np(s["mean"])
        out[torch_name + ".running_var"] = _np(s["var"])
        out[torch_name + ".num_batches_tracked"] = np.zeros((), np.int64)


def export_resnet(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """ResNet (params, batch_stats) flax trees → torchvision-format keys."""
    out: Dict[str, np.ndarray] = {}
    for name, p in params.items():
        m = re.match(r"layer(\d+)_(\d+)$", name)
        if m:
            prefix = f"layer{m.group(1)}.{m.group(2)}"
            s = batch_stats.get(name, {})
            for mod, leafs in p.items():
                if mod.startswith("conv"):
                    out[f"{prefix}.{mod}.weight"] = _conv_w(leafs["kernel"])
                elif mod.startswith("bn"):
                    _emit_bn(out, f"{prefix}.{mod}", leafs, s.get(mod))
                elif mod == "downsample_conv":
                    out[f"{prefix}.downsample.0.weight"] = _conv_w(leafs["kernel"])
                elif mod == "downsample_bn":
                    _emit_bn(out, f"{prefix}.downsample.1", leafs, s.get(mod))
                else:
                    raise ValueError(f"unknown ResNet block module {name}.{mod}")
        elif name.startswith("conv"):
            out[f"{name}.weight"] = _conv_w(p["kernel"])
        elif name.startswith("bn"):
            _emit_bn(out, name, p, batch_stats.get(name))
        else:
            raise ValueError(f"unknown ResNet module {name}")
    return out


def export_efficientnet(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """EfficientNet trees → ``efficientnet_pytorch`` (lukemelas) keys
    (the package the reference's backbones use,
    ``models/building_blocks/backbone_models.py:92-124``)."""
    out: Dict[str, np.ndarray] = {}
    bn_name = {"expand_bn": "_bn0", "depthwise_bn": "_bn1", "project_bn": "_bn2"}
    for name, p in params.items():
        m = re.match(r"block_(\d+)$", name)
        if m:
            prefix = f"_blocks.{m.group(1)}"
            s = batch_stats.get(name, {})
            for mod, leafs in p.items():
                if mod in ("expand_conv", "depthwise_conv", "project_conv"):
                    out[f"{prefix}._{mod}.weight"] = _conv_w(leafs["kernel"])
                elif mod in bn_name:
                    _emit_bn(out, f"{prefix}.{bn_name[mod]}", leafs, s.get(mod))
                elif mod == "se":
                    for se_mod, se_name in (("reduce", "_se_reduce"),
                                            ("expand", "_se_expand")):
                        out[f"{prefix}.{se_name}.weight"] = _conv_w(
                            leafs[se_mod]["kernel"])
                        out[f"{prefix}.{se_name}.bias"] = _np(leafs[se_mod]["bias"])
                else:
                    raise ValueError(f"unknown MBConv module {name}.{mod}")
        elif name == "stem_conv":
            out["_conv_stem.weight"] = _conv_w(p["kernel"])
        elif name == "stem_bn":
            _emit_bn(out, "_bn0", p, batch_stats.get(name))
        elif name == "head_conv":
            out["_conv_head.weight"] = _conv_w(p["kernel"])
        elif name == "head_bn":
            _emit_bn(out, "_bn1", p, batch_stats.get(name))
        else:
            raise ValueError(f"unknown EfficientNet module {name}")
    return out


def _export_linear(out: Dict, torch_name: str, p: Dict):
    out[torch_name + ".weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[torch_name + ".bias"] = _np(p["bias"])


def export_vince_state_dict(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """``VinceEncoder`` (params, batch_stats) → reference ``VinceModel``
    state dict (numpy values; wrap with torch.from_numpy to ``torch.save``).
    """
    backbone_p = params["backbone"]
    backbone_s = batch_stats.get("backbone", {})
    if any(k.startswith(("stem_conv", "block_")) for k in backbone_p):
        backbone = export_efficientnet(backbone_p, backbone_s)
    else:
        backbone = export_resnet(backbone_p, backbone_s)
    out = {"feature_extractor.module.model." + k: v for k, v in backbone.items()}
    if "embedding" in params:
        emb = params["embedding"]
        if "fc1" in emb:
            _export_linear(out, "embedding.0", emb["fc1"])
        if "fc2" in emb:
            _export_linear(out, "embedding.2", emb["fc2"])
    if "imagenet_decoder_0" in params:
        _export_linear(out, "imagenet_decoders.0", params["imagenet_decoder_0"]["fc_out"])
    if "imagenet_decoder_1" in params:
        dec = params["imagenet_decoder_1"]
        if "fc0" in dec:
            _export_linear(out, "imagenet_decoders.1.0", dec["fc0"])
        if "fc_out" in dec:
            _export_linear(out, "imagenet_decoders.1.2", dec["fc_out"])
    if "jigsaw" in params:
        # reference vince_model.py:43-49 — jigsaw_linear + jigsaw_embedding
        # (Linear→ReLU→Linear Sequential)
        jig = params["jigsaw"]
        if "jigsaw_linear" in jig:
            _export_linear(out, "jigsaw_linear", jig["jigsaw_linear"])
        if "fc1" in jig:
            _export_linear(out, "jigsaw_embedding.0", jig["fc1"])
        if "fc2" in jig:
            _export_linear(out, "jigsaw_embedding.2", jig["fc2"])
    if params.get("pool"):
        # attention pooling (reference average_layers = dg_util
        # AttentionPool2D, source unavailable offline): export the 1×1 C→1
        # logits conv under a conv2d-shaped key our converter's
        # shape-driven mapping accepts back, so attention-pool checkpoints
        # round-trip JAX→torch→JAX even though dg_util's exact field names
        # can't be verified here.
        print(
            "torch_export note: attention-pool weights are exported under "
            "'average_layers.attention.*' — a repo-local naming convention "
            "(dg_util AttentionPool2D's real field names are unverifiable "
            "offline). They round-trip through this repo's converter, but a "
            "strict=False load into the upstream torch model will silently "
            "ignore them; verify against dg_util on a networked host."
        )
        pool = params["pool"]["attn_logits"]
        k = _np(pool["kernel"])  # [1, 1, C, 1]
        out["average_layers.attention.weight"] = k.transpose(3, 2, 0, 1)
        if "bias" in pool:
            out["average_layers.attention.bias"] = _np(pool["bias"])
    return out
