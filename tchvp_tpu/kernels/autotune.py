"""Persistent block-size autotuner for the Pallas attention kernels.

The shipped defaults (``DEFAULT_BLOCK_Q/K``, ``DEFAULT_BAND_ROWS`` in
:mod:`tchvp_tpu.kernels.flash_attention`) were chosen by on-chip sweeps
at the shapes that dominate this repo's models (BENCHES.md). Other
workloads hit other knees — at small head dims the kernels are
pipeline-overhead-bound and the best block shape moves with
(S, Dh, window). This module turns the sweep scripts into a framework
capability:

* ``tune_flash`` / ``tune_banded`` measure candidate block shapes ON THE
  CURRENT DEVICE with the standard in-jit timing recipe
  (:func:`tchvp_tpu.utils.timing.timeit`) and persist the winner;
* the kernel entry points consult :func:`flash_blocks` /
  :func:`band_rows` at trace time (shapes are static under jit), so a
  tuned process — and every later process on the same machine — runs the
  measured-best blocks with zero call-site changes.

Cache: one JSON file at ``$TCHVP_AUTOTUNE_CACHE`` or
``~/.cache/tchvp_tpu/autotune.json``, keyed by
``device_kind|kernel|BxHxSxDh|window|dtype``. ``TCHVP_AUTOTUNE_CACHE=0``
disables lookups (defaults apply). Entries record the measured ms and
mode for transparency. Drive it via ``tchvp tune``.

The reference has no counterpart (no kernels at all — stock
``nn.MultiheadAttention``, ``/root/reference/FCT.py:37``); this is part
of build-new component ⊕B (SURVEY §2.1).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Iterable, Optional, Sequence, Tuple

_DEFAULT_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "tchvp_tpu", "autotune.json"
)

_lock = threading.Lock()
_cache: Optional[Dict[str, dict]] = None
_cache_path: Optional[str] = None


def cache_path() -> Optional[str]:
    """Resolved cache file path, or None when disabled."""
    env = os.environ.get("TCHVP_AUTOTUNE_CACHE")
    if env == "0":
        return None
    return env or _DEFAULT_PATH


def _load() -> Dict[str, dict]:
    global _cache, _cache_path
    path = cache_path()
    with _lock:
        if _cache is not None and path == _cache_path:
            return _cache
        _cache_path = path
        _cache = {}
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
                if isinstance(data, dict):
                    _cache = data
            except (OSError, ValueError):
                pass  # unreadable cache == empty cache
        return _cache


def reload() -> None:
    """Drop the in-memory cache (tests; after external edits)."""
    global _cache
    with _lock:
        _cache = None


def _device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _key(kernel: str, shape: Sequence[int], window: int, dtype) -> str:
    import jax.numpy as jnp

    b, h, s, dh = shape
    name = jnp.dtype(dtype).name
    return f"{_device_kind()}|{kernel}|{b}x{h}x{s}x{dh}|w{window}|{name}"


def lookup(kernel: str, shape: Sequence[int], window: int, dtype
           ) -> Optional[dict]:
    """Tuned params for (kernel, shape, window, dtype) or None."""
    if cache_path() is None:
        return None
    entry = _load().get(_key(kernel, shape, window, dtype))
    return dict(entry["params"]) if entry else None


def record(kernel: str, shape: Sequence[int], window: int, dtype,
           params: dict, ms: float, mode: str) -> None:
    """Persist a measured winner (overwrites any previous entry)."""
    path = cache_path()
    if path is None:
        return
    key = _key(kernel, shape, window, dtype)
    cache = _load()
    with _lock:
        cache[key] = {"params": params, "ms": round(ms, 4), "mode": mode}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Trace-time resolution hooks (called by the kernel entry points)
# ---------------------------------------------------------------------------


def flash_blocks(shape: Sequence[int], dtype, block_q: Optional[int],
                 block_k: Optional[int]) -> Tuple[int, int]:
    """(block_q, block_k) for the full-flash kernel: explicit args win,
    then the tuned cache, then the shipped defaults."""
    from tchvp_tpu.kernels import flash_attention as fa

    if block_q is not None and block_k is not None:
        return block_q, block_k
    tuned = lookup("flash", shape, 0, dtype) or {}
    return (
        block_q or tuned.get("block_q", fa.DEFAULT_BLOCK_Q),
        block_k or tuned.get("block_k", fa.DEFAULT_BLOCK_K),
    )


def band_rows(kernel: str, shape: Sequence[int], window: int, dtype,
              block_rows: Optional[int]) -> int:
    """block_rows for the banded/halo kernels (``kernel`` is "band" or
    "halo"): explicit arg, tuned cache, shipped default."""
    from tchvp_tpu.kernels import flash_attention as fa

    if block_rows is not None:
        return block_rows
    tuned = lookup(kernel, shape, window, dtype) or {}
    return tuned.get("block_rows", fa.DEFAULT_BAND_ROWS)


# ---------------------------------------------------------------------------
# Tuners
# ---------------------------------------------------------------------------

FLASH_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (256, 1024), (256, 2048), (512, 512), (512, 1024), (512, 2048),
    (512, 4096), (1024, 1024),
)
BAND_CANDIDATES: Tuple[int, ...] = (64, 128, 256, 512, 1024)


def _measure(fn, *args, mode: str, iters: int) -> float:
    """ms/call of fn (fwd) or value_and_grad(fn) (fwdbwd) on device."""
    import jax
    import jax.numpy as jnp

    from tchvp_tpu.utils.timing import timeit

    if mode == "fwdbwd":
        def loss(*a):
            return fn(*a).astype(jnp.float32).mean()

        def run(*a):
            val, grads = jax.value_and_grad(loss, argnums=tuple(
                range(len(a))))(*a)
            return val + sum(g.astype(jnp.float32).mean() for g in grads)
    else:
        run = fn
    ms, _ = timeit(run, *args, iters=iters)
    return ms


def _rand_qkv(shape, dtype, extra_k: int = 0):
    import jax.numpy as jnp
    import numpy as np

    b, h, s, dh = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, dh)), dtype)
    kv_s = s + extra_k
    k = jnp.asarray(rng.normal(size=(b, h, kv_s, dh)), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, kv_s, dh)), dtype)
    return q, k, v


def tune_flash(shape: Sequence[int], dtype="bfloat16", *,
               mode: str = "fwdbwd", iters: int = 20,
               candidates: Optional[Iterable[Tuple[int, int]]] = None,
               verbose: bool = True) -> Tuple[dict, float]:
    """Sweep (block_q, block_k) for the full-flash kernel at ``shape`` on
    the current device; persist and return the winner. Failing
    candidates (VMEM overflow, compiler errors) are skipped."""
    import jax.numpy as jnp

    from tchvp_tpu.kernels import flash_attention as fa

    dtype = jnp.dtype(dtype)
    q, k, v = _rand_qkv(shape, dtype)
    best: Optional[Tuple[float, dict]] = None
    for bq, bk in (candidates or FLASH_CANDIDATES):
        if bq > shape[2] and bk > shape[2] and best is not None:
            continue  # both clamp to S: duplicate of an earlier point
        try:
            ms = _measure(
                lambda a, b_, c, bq=bq, bk=bk: fa.mha(
                    a, b_, c, block_q=bq, block_k=bk),
                q, k, v, mode=mode, iters=iters)
        except Exception as e:  # OOM / Mosaic errors: skip candidate
            if verbose:
                print(f"  ({bq},{bk}): FAILED {type(e).__name__}", flush=True)
            continue
        if verbose:
            print(f"  ({bq},{bk}): {ms:.3f} ms", flush=True)
        if best is None or ms < best[0]:
            best = (ms, {"block_q": bq, "block_k": bk})
    if best is None:
        raise RuntimeError("every flash candidate failed")
    record("flash", shape, 0, dtype, best[1], best[0], mode)
    return best[1], best[0]


def tune_banded(shape: Sequence[int], window: int, dtype="bfloat16", *,
                halo: bool = False, mode: str = "fwdbwd", iters: int = 20,
                candidates: Optional[Iterable[int]] = None,
                verbose: bool = True) -> Tuple[dict, float]:
    """Sweep block_rows for the banded (or per-shard halo) kernel."""
    import jax.numpy as jnp

    from tchvp_tpu.kernels import flash_attention as fa

    dtype = jnp.dtype(dtype)
    kernel = "halo" if halo else "band"
    q, k, v = _rand_qkv(shape, dtype, extra_k=window if halo else 0)
    best: Optional[Tuple[float, dict]] = None
    for br in (candidates or BAND_CANDIDATES):
        if br > shape[2]:
            continue
        try:
            if halo:
                fn = lambda a, b_, c, br=br: fa.windowed_mha_halo(  # noqa: E731
                    a, b_, c, window_size=window, has_prev=1,
                    block_rows=br)
            else:
                fn = lambda a, b_, c, br=br: fa.windowed_mha(  # noqa: E731
                    a, b_, c, window_size=window, block_rows=br)
            ms = _measure(fn, q, k, v, mode=mode, iters=iters)
        except Exception as e:
            if verbose:
                print(f"  block_rows {br}: FAILED {type(e).__name__}",
                      flush=True)
            continue
        if verbose:
            print(f"  block_rows {br}: {ms:.3f} ms", flush=True)
        if best is None or ms < best[0]:
            best = (ms, {"block_rows": br})
    if best is None:
        raise RuntimeError("every banded candidate failed")
    record(kernel, shape, window, dtype, best[1], best[0], mode)
    return best[1], best[0]
