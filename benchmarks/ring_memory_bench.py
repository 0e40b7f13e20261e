#!/usr/bin/env python
"""Ring-attention BACKWARD memory: remat on vs off (round-4 verdict #6).

The ring's inner block is a plain einsum; without remat, reverse-mode
saves each hop's fp32 logits AND probability blocks — 2n blocks of
(S/n)² per device = O(S²/n) residuals (~4 GB fp32 at FCT-256's 16K
spatial tokens on a 4-way ring). `sdpa_ring_seq_sharded(remat=True)`
(the new default) jax.checkpoints the per-hop update so the backward
recomputes each block from its O(S/n·d) inputs instead.

Measurement: `jax._src.ad_checkpoint.saved_residuals` — the JAX-level
list of exactly what reverse-mode saves between forward and backward
(trace-only, so the full 16K shape costs no memory). XLA's CPU
`memory_analysis()` was tried first and does NOT model buffer liveness
across the fwd/bwd split (temp slab reads ~equal either way — recorded
as a negative in BENCHES.md); the residual list is the ground truth the
checkpoint operates on, and on TPU those residuals are exactly the HBM
the backward must hold. Results -> BENCHES.md.

Run: python benchmarks/ring_memory_bench.py
Env: RING_S (default 16384 = FCT-256 spatial tokens), RING_HEADS (2),
RING_DH (4), RING_B (1), RING_N (4 ring devices).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", int(os.environ.get("RING_N", "4"))
    )

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

S = int(os.environ.get("RING_S", "16384"))
HEADS = int(os.environ.get("RING_HEADS", "2"))
DH = int(os.environ.get("RING_DH", "4"))
B = int(os.environ.get("RING_B", "1"))
N = int(os.environ.get("RING_N", "4"))


def _residual_bytes(f, *args) -> dict:
    from jax._src.ad_checkpoint import saved_residuals

    res = saved_residuals(f, *args)
    total = 0
    n_blocks = 0
    for aval, _src in res:
        shape = getattr(aval, "shape", None)
        if shape is None:
            continue
        nbytes = int(np.prod(shape)) * aval.dtype.itemsize
        total += nbytes
        if nbytes > (1 << 20):
            n_blocks += 1
    return {
        "n_residuals": len(res),
        "big_blocks": n_blocks,
        "total_bytes": total,
        "total_gib": round(total / 2**30, 3),
    }


def main() -> None:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tchvp_tpu.ops.attention import sdpa_ring_seq_sharded
    from tchvp_tpu.parallel import activate_mesh, make_mesh

    mesh = make_mesh(("seq",), (N,), jax.devices()[:N])
    shape = (B, HEADS, S, DH)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    q = jax.device_put(
        np.zeros(shape, np.float32), spec
    )  # zeros: saved_residuals only traces, values never used

    out = {"shape": list(shape), "ring": N}
    with activate_mesh(mesh):
        for remat in (False, True):

            def loss(q, k, v, _remat=remat):
                o = sdpa_ring_seq_sharded(
                    q, k, v, seq_axis="seq", remat=_remat
                )
                return (o.astype(jnp.float32) ** 2).sum()

            out["remat_on" if remat else "remat_off"] = _residual_bytes(
                loss, q, q, q
            )
    off = out["remat_off"]["total_bytes"]
    on = out["remat_on"]["total_bytes"]
    out["reduction_x"] = round(off / max(on, 1), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
