"""Shared on-chip timing helper for every benchmark script.

The single copy of the recipe now lives in the package
(:mod:`tchvp_tpu.utils.timing`) so the kernel autotuner can use it too;
this module stays as the import point for the benchmark scripts.
"""

from tchvp_tpu.utils.timing import _bump, timeit  # noqa: F401
