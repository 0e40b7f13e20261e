"""Persistent XLA compilation cache for CLI / bench entry points.

The reference's eager PyTorch workflow starts instantly
(``/root/reference/FCT.py:410-412``); the TPU build's regression there is
compile latency — FCT-256 costs ~286 s cold vs ~25 s warm per process
over the tunneled chip (BENCHES.md kernel table). Caching compiled
executables on disk makes every process after the first start warm.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tchvp_tpu", "xla"
)


def enable_compilation_cache(directory: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``directory``.

    Default: ``$TCHVP_COMPILE_CACHE`` or ``~/.cache/tchvp_tpu/xla``.
    Set ``TCHVP_COMPILE_CACHE=0`` to disable. Returns the directory used
    (None when disabled or unsupported)."""
    env = os.environ.get("TCHVP_COMPILE_CACHE")
    if env == "0":
        return None
    directory = directory or env or _DEFAULT_DIR
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # Cache everything that takes meaningful compile time; the
        # default 1 s floor already skips trivial programs.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None  # older jax without the knobs: run uncached
    return directory
