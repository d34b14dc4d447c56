"""Named transform pipelines — registry parity with reference
``utils/transforms.py:11-22`` (``transforms.__all__``). Each name maps to an
``AugmentConfig`` driving the fused on-device pipeline in
``vince_tpu.ops.augment`` (parameters cited per reference class).

``RepeatedImagenetTransform`` semantics (k augmented views per image, val's
first view val-transformed — reference ``transforms.py:179-204``) are realized
by the caller invoking ``augment_batch`` k times with distinct fold-in keys
(and ``train=False`` for the first val view).
"""

import dataclasses
from typing import Dict, Tuple

from vince_tpu.ops.augment import AugmentConfig

__all__ = [
    "BasicImagenetTransform",
    "StandardVideoTransform",
    "SimCLRTransform",
    "JigsawTransform",
    "SunSceneTransform",
    "Kinetics400Transform",
    "GOT10KTransform",
    "RepeatedImagenetTransform",
    "MoCoV1ImagenetTransform",
    "MoCoV2ImagenetTransform",
]

_TV_RATIO = (3.0 / 4.0, 4.0 / 3.0)  # torchvision default


def _cfg(size: Tuple[int, int], **kw) -> AugmentConfig:
    return dataclasses.replace(AugmentConfig(size=size), **kw)


def make_config(name: str, size, jitter_order: str = None) -> AugmentConfig:
    if isinstance(size, int):
        size = (size, size)
    size = tuple(size)
    if jitter_order is not None:
        cfg = make_config(name, size)
        return dataclasses.replace(cfg, jitter_order=jitter_order)
    if name not in _BUILDERS:
        raise KeyError(f"unknown transform {name!r}; choices: {sorted(_BUILDERS)}")
    return _BUILDERS[name](size)


# reference transforms.py:62-86 — RRC(0.2-1, ratio 0.7-1.4), jitter .4/.4/.4/.2
def BasicImagenetTransform(size):
    return _cfg(size, crop_scale=(0.2, 1.0), crop_ratio=(0.7, 1.4))


# reference transforms.py:89-101 — RRC(0.2-1, default ratio); video default
def StandardVideoTransform(size):
    return _cfg(size, crop_scale=(0.2, 1.0), crop_ratio=_TV_RATIO)


# reference transforms.py:104-117 — jitter .8/.8/.8/.2 + blur p=.5
def SimCLRTransform(size):
    return _cfg(
        size, crop_scale=(0.2, 1.0), crop_ratio=_TV_RATIO,
        brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2, blur_prob=0.5,
    )


# reference transforms.py:120-133 — RRC(0.7-1) + strong jitter + blur
def JigsawTransform(size):
    return _cfg(
        size, crop_scale=(0.7, 1.0), crop_ratio=_TV_RATIO,
        brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2, blur_prob=0.5,
    )


# reference transforms.py:136-148 — RRC(0.7-1)
def SunSceneTransform(size):
    return _cfg(size, crop_scale=(0.7, 1.0), crop_ratio=_TV_RATIO)


# reference transforms.py:151-163 — RRC(0.5-1)
def Kinetics400Transform(size):
    return _cfg(size, crop_scale=(0.5, 1.0), crop_ratio=_TV_RATIO)


# reference transforms.py:166-176 — RRC(0.2-1), flip only (no jitter/grayscale)
def GOT10KTransform(size):
    return _cfg(
        size, crop_scale=(0.2, 1.0), crop_ratio=_TV_RATIO,
        brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0, grayscale_prob=0.0,
    )


# reference transforms.py:179-204 — same aug as Basic, repeated-view semantics
def RepeatedImagenetTransform(size):
    return BasicImagenetTransform(size)


# reference transforms.py:207-220 — RRC(0.08-1)
def MoCoV1ImagenetTransform(size):
    return _cfg(size, crop_scale=(0.08, 1.0), crop_ratio=_TV_RATIO)


# reference transforms.py:223-235 — jitter .4/.4/.4/.4 + blur p=.5
def MoCoV2ImagenetTransform(size):
    return _cfg(
        size, crop_scale=(0.2, 1.0), crop_ratio=_TV_RATIO,
        brightness=0.4, contrast=0.4, saturation=0.4, hue=0.4, blur_prob=0.5,
    )


_BUILDERS: Dict[str, object] = {name: globals()[name] for name in __all__}
REGISTRY = _BUILDERS
