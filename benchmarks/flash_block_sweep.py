#!/usr/bin/env python
"""On-chip (block_q, block_k) sweep for the Pallas flash kernel.

Motivation: `kernels/flash_attention.py` ships one default block shape
(512, 512). The FCT family's spatial attention runs at extreme shapes —
S = H*W up to 16K tokens with tiny head dims (Dh = C/heads as small as
4, reference `FCT.py:214` filters + 2 heads) — where the right tile
shape is not obviously the same as at the flagship's temporal shape
(S 16, Dh 64) or the windowed-bench point (S 4096, Dh 64). This sweep
measures the candidates at the shapes that dominate FCT-128/256 forward
time and prints a table; the winner (if not the default) becomes the
shape-aware default in `mha`.

Timing per CLAUDE.md: in-jit fori_loop, input perturbed by loop index,
ONE scalar readback (per-call host timing lies over the tunnel).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import timeit


# FCT spatial-attention shapes (B, H, S, Dh) that dominate its forward
# time (highest-resolution stages; S drops 4x per stage so stage 1+2 are
# ~95% of attention FLOPs), plus the standing windowed-bench point.
SHAPES = [
    ("fct256-stage1", 2, 2, 16384, 4),
    ("fct256-stage2", 2, 2, 4096, 8),
    ("bench-point", 2, 8, 4096, 64),
]

CANDIDATES = [
    (256, 256),
    (512, 512),  # round-2 default
    (512, 1024),
    (1024, 512),
    (1024, 1024),
    (2048, 512),
    (512, 2048),  # shipped default (round 3) — see table in BENCHES.md
    (1024, 2048),
    (512, 4096),
    # (2048, 1024) OOMs the 16 MB scoped VMEM at S 16384 (fwd fp32
    # logits block 8 MB + pipeline double-buffering = 16.8 MB).
]


def main():
    from tchvp_tpu.kernels import flash_attention
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    bwd = "--bwd" in sys.argv
    print(f"device: {jax.devices()[0]}  mode: {'fwd+bwd' if bwd else 'fwd'}")
    rng = np.random.default_rng(0)
    results = {}
    for name, b, h, s, dh in SHAPES:
        q = jnp.asarray(rng.normal(size=(b, h, s, dh)), jnp.bfloat16)
        print(f"\n{name}: B{b} H{h} S{s} Dh{dh} bf16")
        for bq, bk in CANDIDATES:
            if bq > s or bk > s:
                continue

            def f(t, bq=bq, bk=bk):
                call = lambda u: flash_attention.mha(  # noqa: E731
                    u, u, u, block_q=bq, block_k=bk
                )
                if bwd:
                    return jax.grad(lambda u: call(u).astype(jnp.float32).sum())(t)
                return call(t)

            try:
                ms, comp = timeit(f, q)
            except Exception as e:  # VMEM OOM boundary is data, not failure
                print(f"  block ({bq:4d},{bk:4d}): FAILED "
                      f"({type(e).__name__}: {str(e)[:80]})", flush=True)
                continue
            results[(name, bq, bk)] = ms
            print(f"  block ({bq:4d},{bk:4d}): {ms:8.3f} ms "
                  f"[compile {comp:.0f}s]", flush=True)
        best = min(
            ((k, v) for k, v in results.items() if k[0] == name),
            key=lambda kv: kv[1],
        )
        print(f"  -> best {best[0][1:]} at {best[1]:.3f} ms "
              f"(round-2 default (512,512): "
              f"{results.get((name, 512, 512), float('nan')):.3f} ms)")


if __name__ == "__main__":
    main()
