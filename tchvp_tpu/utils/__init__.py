"""Utilities: image artifact dumps, misc helpers."""

from tchvp_tpu.utils.imaging import (
    save_image,
    save_sample_triplet,
    save_side_by_side,
    to_uint8,
)

__all__ = ["save_image", "save_sample_triplet", "save_side_by_side", "to_uint8"]
