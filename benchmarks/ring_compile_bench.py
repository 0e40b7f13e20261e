#!/usr/bin/env python
"""Ring-attention compile-time scaling: unrolled vs lax.scan body.

Round-3 verdict weak #5: the unrolled ring's trace and program size grow
O(n) with the seq axis — unmeasured beyond n=4. This measures
trace+lower+compile wall time and StableHLO program size for both loop
forms at n = 8 / 16 / 32 on a virtual CPU mesh (the collective structure
— and therefore the program size — is platform-independent; absolute
compile seconds on a TPU toolchain differ but scale the same way).

Run:  python benchmarks/ring_compile_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MAX = int(os.environ.get("RING_BENCH_NMAX", "32"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", N_MAX)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tchvp_tpu.ops.attention import sdpa_ring_seq_sharded  # noqa: E402
from tchvp_tpu.parallel import activate_mesh, make_mesh  # noqa: E402


def measure(n: int, loop: str, s_per_dev: int = 16) -> dict:
    mesh = make_mesh(("seq",), (n,), jax.devices()[:n])
    b, h, s, dh = 1, 4, n * s_per_dev, 8
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
        for _ in range(3)
    )
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    def loss(q, k, v):
        out = sdpa_ring_seq_sharded(q, k, v, seq_axis="seq", loop=loop)
        return (out**2).sum()

    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    with activate_mesh(mesh):
        t0 = time.perf_counter()
        lowered = fn.lower(qs, ks, vs)
        t_trace = time.perf_counter() - t0
        hlo_lines = lowered.as_text().count("\n")
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        # Numeric sanity: both forms agree with each other at this n.
        val, _ = compiled(qs, ks, vs)
    return {
        "n": n,
        "loop": loop,
        "trace_lower_s": round(t_trace, 2),
        "compile_s": round(t_compile, 2),
        "stablehlo_lines": hlo_lines,
        "val": float(val),
    }


def main() -> None:
    rows = []
    for n in (8, 16, 32):
        if n > N_MAX:
            continue
        r_unroll = measure(n, "unroll")
        r_scan = measure(n, "scan")
        assert abs(r_unroll["val"] - r_scan["val"]) < 1e-3 * abs(
            r_unroll["val"]
        ), (r_unroll["val"], r_scan["val"])
        rows += [r_unroll, r_scan]
        print(
            f"n={n:3d}  unroll: trace {r_unroll['trace_lower_s']:6.2f}s "
            f"compile {r_unroll['compile_s']:6.2f}s "
            f"hlo {r_unroll['stablehlo_lines']:6d} lines | "
            f"scan: trace {r_scan['trace_lower_s']:6.2f}s "
            f"compile {r_scan['compile_s']:6.2f}s "
            f"hlo {r_scan['stablehlo_lines']:6d} lines"
        )
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
