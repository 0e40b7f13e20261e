"""Data layer (survey L1): CSV manifests, packed-clip native loader,
synthetic generators, on-device preprocessing + augmentation."""

from tchvp_tpu.data.clippack import (
    ClipPackDataset,
    pack_clips,
    pack_from_manifest,
)
from tchvp_tpu.data.manifest import (
    ClipDataset,
    ImageDataset,
    ImageMaskDataset,
    make_loaders,
    read_manifest,
    write_clip_manifest,
    write_manifest,
)
from tchvp_tpu.data.synthetic import SyntheticClips, SyntheticImageMasks, SyntheticImages
from tchvp_tpu.data import pipeline

__all__ = [
    "ClipPackDataset",
    "pack_clips",
    "pack_from_manifest",
    "ClipDataset",
    "ImageDataset",
    "ImageMaskDataset",
    "make_loaders",
    "read_manifest",
    "write_manifest",
    "write_clip_manifest",
    "SyntheticClips",
    "SyntheticImageMasks",
    "SyntheticImages",
    "pipeline",
]
