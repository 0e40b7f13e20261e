"""Utilities: image artifact dumps, profiling hooks, misc helpers."""

from tchvp_tpu.utils.cache import enable_compilation_cache
from tchvp_tpu.utils.imaging import (
    save_image,
    save_sample_triplet,
    save_side_by_side,
    to_uint8,
)
from tchvp_tpu.utils.profiling import StepTimer, annotate, trace
from tchvp_tpu.utils.summary import count_params, describe, summarize

__all__ = [
    "enable_compilation_cache",
    "count_params",
    "describe",
    "summarize",
    "save_image",
    "save_sample_triplet",
    "save_side_by_side",
    "to_uint8",
    "StepTimer",
    "annotate",
    "trace",
]
