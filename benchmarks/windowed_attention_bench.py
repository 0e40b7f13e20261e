#!/usr/bin/env python
"""On-chip timing of the banded/windowed attention routes THROUGH the
public dispatch (`ops/attention.py::multi_head_attention`), not the bare
kernels (VERDICT r2 next-round #3).

One tunneled chip cannot execute the multi-device shard_map band (the
seq mesh would have size 1 and the gate correctly falls back — the
engaged path is execution-proven on the 8-CPU mesh in
tests/test_parallel.py). What IS measurable on the chip:

* `multi_head_attention(impl="flash", window_size=w)` — the banded flash
  kernel the shard_map body runs per shard (minus the halo column);
* `multi_head_attention(impl="windowed", ...)` — the XLA band;
* `multi_head_attention(impl="xla")` — full quadratic attention, the
  O(S^2) cost the band avoids;
* `windowed_mha_halo` at per-shard shape — the exact kernel invoked
  inside the shard_map body (halo column included).

Shapes: the r2 standalone measurement point (B2 x H8 x S4096 x D64,
window 64, bf16) so numbers are comparable round-over-round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from benchmarks._timing import timeit as _timeit


def timeit(fn, *args, iters=20):
    """ms/call via the shared in-jit loop recipe (benchmarks/_timing.py)."""
    ms, _ = _timeit(fn, *args, iters=iters, verbose=True)
    return ms


def main():
    from tchvp_tpu.ops.attention import multi_head_attention
    from tchvp_tpu.kernels import flash_attention
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, heads, s, dh, w = 2, 8, 4096, 64, 64
    d = heads * dh
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, d)), jnp.bfloat16)

    print(f"device: {jax.devices()[0]}, shape B{b} H{heads} S{s} Dh{dh} w{w} bf16")

    # Banded rows first (the seq-parallel per-shard routes, VERDICT r2
    # #3); the full-quadratic xla row is opt-in (WAB_FULL_XLA=1) — its
    # S=4096 fp32-logits loop has wedged the tunneled chip for >10 min.
    rows = [("windowed", w), ("flash", w), ("flash", 0)]
    if os.environ.get("WAB_FULL_XLA") == "1":
        rows.append(("xla", 0))
    for impl, win in rows:
        f = lambda t, impl=impl, win=win: multi_head_attention(
            t, t, t, heads, impl=impl, window_size=win
        )
        ms = timeit(f, x)
        print(f"multi_head_attention impl={impl:8s} window={win:3d}: {ms:7.2f} ms")

    # The per-shard halo kernel at an n=4-shard slice of the same
    # sequence: S/4 local tokens + one halo window of k/v.
    sl = s // 4
    qh = jnp.asarray(rng.normal(size=(b, heads, sl, dh)), jnp.bfloat16)
    ke = jnp.asarray(rng.normal(size=(b, heads, sl + w, dh)), jnp.bfloat16)
    halo = lambda q, k: flash_attention.windowed_mha_halo(
        q, k, k, window_size=w, has_prev=jnp.int32(1)
    )
    ms = timeit(halo, qh, ke)
    print(f"windowed_mha_halo per-shard (S/4={sl}+halo): {ms:7.2f} ms")


if __name__ == "__main__":
    main()
