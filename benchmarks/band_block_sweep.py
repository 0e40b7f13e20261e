#!/usr/bin/env python
"""On-chip block_rows sweep for the GROUPED banded/halo Pallas kernels.

Round 3 replaced the per-window streaming band (grid step = one
(w, Dh, w) matmul) with grouped single-pass blocks of
G = block_rows // window query windows per step
(`kernels/flash_attention.py`, banded-kernel section). DEFAULT_BAND_ROWS
= 512 was chosen by analogy with the full-flash sweep
(`flash_block_sweep.py`); this script measures the actual knee on the
chip at the standing windowed-bench point and the config-2 temporal
shape, for both the band (`windowed_mha`) and the seq-parallel per-shard
halo kernel (`windowed_mha_halo`).

Timing per CLAUDE.md: in-jit fori_loop, input perturbed by loop index,
ONE scalar readback.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import timeit


# (name, B, H, S, Dh, window): the standing windowed-bench point and the
# per-shard slice the seq-parallel path actually runs (S/4 + halo).
SHAPES = [
    ("bench-point", 2, 8, 4096, 64, 64),
    ("per-shard", 2, 8, 1024, 64, 64),
]

BLOCK_ROWS = [64, 128, 256, 512, 1024, 2048]


def main():
    from tchvp_tpu.kernels import flash_attention as fa
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    bwd = "--bwd" in sys.argv
    print(f"device: {jax.devices()[0]}  mode: {'fwd+bwd' if bwd else 'fwd'}")
    rng = np.random.default_rng(0)
    for name, b, h, s, dh, w in SHAPES:
        q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.bfloat16)
        ke = jnp.asarray(rng.normal(size=(b, h, s + w, dh)), jnp.bfloat16)
        print(f"\n{name}: B{b} H{h} S{s} Dh{dh} w{w} bf16")
        for br in BLOCK_ROWS:
            if br > s:
                continue

            def band(t, br=br):
                call = lambda u: fa.windowed_mha(  # noqa: E731
                    u, u, u, window_size=w, block_rows=br
                )
                if bwd:
                    return jax.grad(
                        lambda u: call(u).astype(jnp.float32).sum()
                    )(t)
                return call(t)

            def halo(t, kx, br=br):
                call = lambda u, kk: fa.windowed_mha_halo(  # noqa: E731
                    u, kk, kk, window_size=w, has_prev=jnp.int32(1),
                    block_rows=br,
                )
                if bwd:
                    return jax.grad(
                        lambda u: call(u, kx).astype(jnp.float32).sum()
                    )(t)
                return call(t, kx)

            try:
                bms, _ = timeit(band, q)
                hms, _ = timeit(halo, q, ke)
            except Exception as e:  # VMEM OOM boundary is data, not failure
                print(f"  block_rows {br:5d}: FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})", flush=True)
                continue
            star = " <- default" if br == fa.DEFAULT_BAND_ROWS else ""
            print(f"  block_rows {br:5d}: band {bms:7.3f} ms  "
                  f"halo {hms:7.3f} ms{star}", flush=True)


if __name__ == "__main__":
    main()
