"""Dataset registry — parity with reference ``datasets/__init__.py:9-18``
(string→class lookup used by the CLI), plus the procedural datasets this
framework adds for offline testing/benchmarking."""

from vince_tpu.data.imagenet_dataset import ImagenetDataset, SunSceneDataset
from vince_tpu.data.npz_dataset import NPZDataset, NPZImageDataset
from vince_tpu.data.r2v2_dataset import GOT10KR2V2Dataset, R2V2Dataset
from vince_tpu.data.synthetic_dataset import (
    SyntheticClipDataset,
    SyntheticImageDataset,
    SyntheticTextureClipDataset,
    SyntheticTextureImageDataset,
    SyntheticTextureVideoDataset,
    SyntheticVideoDataset,
)

__all__ = [
    "GOT10kDataset",
    "ImagenetDataset",
    "Kinetics400Dataset",
    "NPZDataset",
    "NPZImageDataset",
    "R2V2Dataset",
    "GOT10KR2V2Dataset",
    "SunSceneDataset",
    "VideoCacherDataset",
    "SyntheticVideoDataset",
    "SyntheticTextureVideoDataset",
    "SyntheticImageDataset",
    "SyntheticClipDataset",
    "SyntheticTextureImageDataset",
    "SyntheticTextureClipDataset",
]


def get_dataset(name: str):
    if name in ("GOT10kDataset", "Kinetics400Dataset", "VideoCacherDataset"):
        # populated by later modules; import lazily to avoid heavy deps
        import importlib

        mod = {
            "GOT10kDataset": "vince_tpu.data.got10k_dataset",
            "Kinetics400Dataset": "vince_tpu.data.kinetics_dataset",
            "VideoCacherDataset": "vince_tpu.data.video_cacher_dataset",
        }[name]
        return getattr(importlib.import_module(mod), name)
    if name not in __all__:
        raise KeyError(f"unknown dataset {name!r}; choices: {__all__}")
    return globals()[name]
