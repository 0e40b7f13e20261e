"""Data layer (survey L1): CSV manifests, synthetic generators, on-device
preprocessing + augmentation."""

from tchvp_tpu.data.manifest import (
    ClipDataset,
    ImageDataset,
    ImageMaskDataset,
    make_loaders,
    read_manifest,
)
from tchvp_tpu.data.synthetic import SyntheticClips, SyntheticImageMasks, SyntheticImages
from tchvp_tpu.data import pipeline

__all__ = [
    "ClipDataset",
    "ImageDataset",
    "ImageMaskDataset",
    "make_loaders",
    "read_manifest",
    "SyntheticClips",
    "SyntheticImageMasks",
    "SyntheticImages",
    "pipeline",
]
