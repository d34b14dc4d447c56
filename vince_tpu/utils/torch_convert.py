"""Torch→JAX weight conversion for ResNet backbones and VINCE checkpoints.

SURVEY.md §7 ("hard parts"): linear-probe parity against the reference's
released PyTorch weights requires importing torchvision-format ResNet18/50
state dicts (incl. BN running stats) into the flax parameter tree. The
reference ships weights fetched by ``download_scripts/
download_pretrained_weights_resnet{18,50}.sh``; their state dicts carry
prefixes like ``feature_extractor.module.model.`` (DataParallel + Backbone
wrapper, reference ``vince_model.py:26,35``) which are stripped here.

Layout maps:
  - conv weight  [O, I, kh, kw]  →  kernel [kh, kw, I, O]
  - linear weight [O, I]         →  kernel [I, O]
  - bn weight/bias               →  scale/bias (params)
  - bn running_mean/var          →  mean/var (batch_stats)
"""

import re
from typing import Dict, Tuple

import numpy as np

_KNOWN_PREFIXES = (
    "feature_extractor.module.model.",
    "feature_extractor.module.",
    "feature_extractor.model.",
    "feature_extractor.",
    "module.model.",
    "module.",
    "model.",
)


def _strip_prefix(key: str) -> str:
    for p in _KNOWN_PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_resnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    strip_prefixes: bool = True,
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict → (params, batch_stats) flax trees
    matching ``vince_tpu.models.resnet.ResNet`` naming."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for raw_key, tensor in state_dict.items():
        key = _strip_prefix(raw_key) if strip_prefixes else raw_key
        v = _to_numpy(tensor)
        if key in ("fc.weight", "fc.bias") or key.endswith("num_batches_tracked"):
            continue
        # layerL.B.xxx → layerL_B.xxx (our flat block naming)
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", key)
        if m:
            block = f"layer{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
        else:
            block = None
            rest = key

        def emit(mod_name: str, leaf: str, value):
            path = ([block, mod_name] if block else [mod_name]) + [leaf]
            if leaf in ("mean", "var"):
                put(stats, path, value)
            else:
                put(params, path, value)

        parts = rest.split(".")
        if parts[0].startswith("conv") and parts[-1] == "weight":
            emit(parts[0], "kernel", v.transpose(2, 3, 1, 0))
        elif parts[0].startswith("bn"):
            leaf = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[parts[1]]
            emit(parts[0], leaf, v)
        elif parts[0] == "downsample":
            if parts[1] == "0" and parts[2] == "weight":
                emit("downsample_conv", "kernel", v.transpose(2, 3, 1, 0))
            elif parts[1] == "1":
                leaf = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[parts[2]]
                emit("downsample_bn", leaf, v)
        # anything else (heads etc.) handled by convert_vince_state_dict
    return params, stats


_EN_BN_LEAF = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}


def convert_efficientnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    strip_prefixes: bool = True,
) -> Tuple[Dict, Dict]:
    """``efficientnet_pytorch`` (lukemelas) EfficientNet state_dict →
    (params, batch_stats) flax trees matching
    ``vince_tpu.models.efficientnet.EfficientNet`` naming.

    Reference backbones use this package (reference
    ``models/building_blocks/backbone_models.py:92-124``). Name map:
    ``_conv_stem/_bn0`` → stem, ``_blocks.{i}._{expand,depthwise,project}_conv``
    + ``_bn{0,1,2}`` → ``block_{i}``, ``_se_{reduce,expand}`` → ``se``,
    ``_conv_head``/top-level ``_bn1`` → head. The classifier ``_fc`` is
    dropped (feature extractor only). Depthwise weights [C,1,kh,kw] map to
    flax grouped-conv kernels [kh,kw,1,C] with the same transpose as dense
    convs.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(path, value, is_stat):
        node = stats if is_stat else params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for raw_key, tensor in state_dict.items():
        key = _strip_prefix(raw_key) if strip_prefixes else raw_key
        if key.startswith("_fc.") or key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(tensor)
        m = re.match(r"_blocks\.(\d+)\.(.*)", key)
        if m:
            block = f"block_{m.group(1)}"
            rest = m.group(2)
            if rest == "_expand_conv.weight":
                put([block, "expand_conv", "kernel"], v.transpose(2, 3, 1, 0), False)
            elif rest == "_depthwise_conv.weight":
                put([block, "depthwise_conv", "kernel"], v.transpose(2, 3, 1, 0), False)
            elif rest == "_project_conv.weight":
                put([block, "project_conv", "kernel"], v.transpose(2, 3, 1, 0), False)
            elif rest.startswith("_se_"):
                mod = {"_se_reduce": "reduce", "_se_expand": "expand"}[rest.split(".")[0]]
                leaf = rest.split(".")[1]
                value = v.transpose(2, 3, 1, 0) if leaf == "weight" else v
                put([block, "se", mod, "kernel" if leaf == "weight" else "bias"],
                    value, False)
            elif rest.startswith("_bn"):
                bn = {"_bn0": "expand_bn", "_bn1": "depthwise_bn",
                      "_bn2": "project_bn"}[rest.split(".")[0]]
                leaf = _EN_BN_LEAF[rest.split(".")[1]]
                put([block, bn, leaf], v, leaf in ("mean", "var"))
        elif key == "_conv_stem.weight":
            put(["stem_conv", "kernel"], v.transpose(2, 3, 1, 0), False)
        elif key == "_conv_head.weight":
            put(["head_conv", "kernel"], v.transpose(2, 3, 1, 0), False)
        elif key.startswith(("_bn0.", "_bn1.")):
            bn = "stem_bn" if key.startswith("_bn0.") else "head_bn"
            leaf = _EN_BN_LEAF[key.split(".")[1]]
            put([bn, leaf], v, leaf in ("mean", "var"))
    return params, stats


def convert_linear(weight, bias=None) -> Dict:
    out = {"kernel": _to_numpy(weight).T}
    if bias is not None:
        out["bias"] = _to_numpy(bias)
    return out


def convert_vince_state_dict(state_dict) -> Tuple[Dict, Dict]:
    """Full reference VinceModel state_dict → (params, batch_stats) for
    ``VinceEncoder``: backbone (under ``backbone``), projection MLP
    (``embedding.0/2`` → embedding.fc1/fc2, reference vince_model.py:38-42),
    imagenet decoders (:79-90)."""
    backbone_sd = {}
    other = {}
    for key, tensor in state_dict.items():
        skey = _strip_prefix(key)
        if skey.startswith(("embedding.", "imagenet_decoders.", "jigsaw")):
            other[skey] = tensor
        elif key != skey or re.match(r"(conv1|bn1|layer\d|_conv_stem|_blocks|_conv_head|_bn\d)", skey):
            backbone_sd[skey] = tensor
    if any(k.startswith("_conv_stem") for k in backbone_sd):
        b_params, b_stats = convert_efficientnet_state_dict(backbone_sd, strip_prefixes=False)
    else:
        b_params, b_stats = convert_resnet_state_dict(backbone_sd, strip_prefixes=False)
    params: Dict = {"backbone": b_params}
    stats: Dict = {"backbone": b_stats}

    def maybe(name_t, name_f):
        w = other.get(name_t + ".weight")
        if w is not None:
            return {name_f: convert_linear(w, other.get(name_t + ".bias"))}
        return {}

    emb = {}
    emb.update(maybe("embedding.0", "fc1"))
    emb.update(maybe("embedding.2", "fc2"))
    if emb:
        params["embedding"] = emb
    dec0 = maybe("imagenet_decoders.0", "fc_out")
    if dec0:
        params["imagenet_decoder_0"] = dec0
    dec1 = {}
    dec1.update(maybe("imagenet_decoders.1.0", "fc0"))
    dec1.update(maybe("imagenet_decoders.1.2", "fc_out"))
    if dec1:
        params["imagenet_decoder_1"] = dec1
    # PIRL jigsaw heads (reference vince_model.py:43-49): per-patch linear +
    # Linear→ReLU→Linear Sequential over the 9-patch concat
    jig = {}
    jig.update(maybe("jigsaw_linear", "jigsaw_linear"))
    jig.update(maybe("jigsaw_embedding.0", "fc1"))
    jig.update(maybe("jigsaw_embedding.2", "fc2"))
    if jig:
        params["jigsaw"] = jig
    attn = {k: _to_numpy(t) for k, t in state_dict.items()
            if _strip_prefix(k).startswith("average_layers.") and hasattr(t, "shape")}
    if attn:
        pool = _convert_attention_pool(attn)
        if pool is not None:
            params["pool"] = pool
        else:
            print("WARNING: checkpoint carries attention-pool (average_layers.*) "
                  "weights whose shapes do not identify a single 1×1 C→1 "
                  "attention map — NOT converted; restore with --use-attention "
                  "will re-initialize the pool")
    return params, stats


def _convert_attention_pool(tensors: Dict[str, "np.ndarray"]):
    """Structure-driven mapping of ``average_layers.*`` (reference
    vince_model.py:31 — dg_util AttentionPool2D, whose source is unavailable
    offline) onto our softmax-attention pool (heads.AttentionPool2D: one 1×1
    conv C→1 producing the spatial logits).

    Converts ONLY when the tensor shapes identify that map unambiguously:
    exactly one weight with a single output unit (conv ``[1, C, 1, 1]`` or
    linear ``[1, C]``) plus at most one ``[1]`` bias. Anything richer means a
    different architecture — refuse rather than guess wrong. Returns the flax
    ``pool`` subtree or None.
    """
    weights, biases = [], []
    for v in tensors.values():
        if v.ndim == 0 or not np.issubdtype(v.dtype, np.floating):
            continue  # num_batches_tracked-style counters
        if v.ndim == 4 and v.shape[0] == 1 and v.shape[2] == v.shape[3] == 1:
            weights.append(v.transpose(2, 3, 1, 0))  # [O,I,kh,kw]→[kh,kw,I,O]
        elif v.ndim == 2 and v.shape[0] == 1:
            weights.append(v.T.reshape(1, 1, v.shape[1], 1))
        elif v.ndim == 1 and v.shape[0] == 1:
            biases.append(v)
        else:
            return None
    if len(weights) != 1 or len(biases) > 1:
        return None
    mod = {"kernel": weights[0]}
    if biases:
        mod["bias"] = biases[0]
    return {"attn_logits": mod}


def load_torch_checkpoint(path: str):
    """Load a .pt/.pth file (requires torch, CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj
