"""Backbone registry — parity with reference ``backbone_models.py:7-18``
(``__all__``-driven string→class lookup used by the CLI registries,
``arg_parser.py:14-35``).

Each entry is a flax module factory taking (norm/axis config) kwargs and
exposing ``output_channels``. The reference's ``Backbone`` truncation wrapper
(``backbone_models.py:21-54``) is unnecessary here: our extractors already
return the ``final_layer=-2`` spatial features, and shallower truncation is
expressed by the ``features`` argument on ResNet variants if ever needed.
"""

from typing import Any, Dict

from vince_tpu.models import efficientnet, resnet

__all__ = [
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNet50w2",
    "ResNet50w4",
    "ResNet18SiamFCDilated",
    "ResNet50SiamFCDilated",
    "EfficientNetB0",
    "EfficientNetB1",
    "EfficientNetB2",
    "EfficientNetB3",
    "EfficientNetB4",
]

ResNet18 = resnet.ResNet18
ResNet34 = resnet.ResNet34
ResNet50 = resnet.ResNet50
ResNet50w2 = resnet.ResNet50w2
ResNet50w4 = resnet.ResNet50w4
ResNet18SiamFCDilated = resnet.ResNet18SiamFCDilated
ResNet50SiamFCDilated = resnet.ResNet50SiamFCDilated
EfficientNetB0 = efficientnet.EfficientNetB0
EfficientNetB1 = efficientnet.EfficientNetB1
EfficientNetB2 = efficientnet.EfficientNetB2
EfficientNetB3 = efficientnet.EfficientNetB3
EfficientNetB4 = efficientnet.EfficientNetB4

REGISTRY: Dict[str, Any] = {name: globals()[name] for name in __all__}


def get_backbone(name: str):
    if name not in REGISTRY:
        raise KeyError(f"unknown backbone {name!r}; choices: {sorted(REGISTRY)}")
    return REGISTRY[name]
