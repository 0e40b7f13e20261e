"""THE on-chip timing recipe (CLAUDE.md): one jitted ``lax.fori_loop``
ending in ONE scalar readback.

The axon tunnel's ``block_until_ready`` is async-ish and a per-call host
readback costs ~30 ms, so per-call host timing lies for multi-ms
kernels. The loop body perturbs its inputs with the loop index so XLA
cannot hoist the op out of the loop.

This is the single copy — ``benchmarks/_timing.py`` re-exports it, and
:mod:`tchvp_tpu.kernels.autotune` measures candidates with it. A fix to
the recipe must not have to chase per-script duplicates (round-3 review
finding).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def _bump(t, i):
    """Perturb ``t`` with loop index ``i`` so XLA can't hoist the op.

    Integer dtypes would truncate ``1e-6`` to 0 and XLA would fold the
    perturbation away, hoisting ``fn`` out of the loop entirely (the
    benchmark would then time an empty loop — round-3 review finding).
    Alternate +0/+1 instead: still data-dependent on ``i``, still cheap.
    """
    if t.dtype == jnp.bool_:
        return t ^ (i % 2).astype(jnp.bool_)
    if jnp.issubdtype(t.dtype, jnp.integer):
        return t + (i % 2).astype(t.dtype)
    return t + i * jnp.asarray(1e-6, t.dtype)


def timeit(fn, *args, iters: int = 20, perturb: Optional[int] = None,
           verbose: bool = False):
    """(ms_per_call, compile_seconds) for ``fn(*args)`` on the device.

    ``perturb``: how many LEADING args to perturb with the loop index
    (None = all). Pass 1 when the remaining args are weights/qparams
    whose values must stay exact (e.g. calibrated int8 scales).
    """
    n = len(args) if perturb is None else perturb

    @jax.jit
    def loop(*a):
        def body(i, acc):
            bumped = tuple(_bump(t, i) for t in a[:n])
            out = fn(*bumped, *a[n:])
            return acc + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(*args))  # compile + warm
    compile_s = time.perf_counter() - t0
    if verbose:
        print(f"  [compile+first {compile_s:.1f}s]", flush=True)
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3, compile_s
