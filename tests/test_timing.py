"""The shared bench timer (benchmarks/_timing.py) must actually measure.

Round-3 review finding: the loop-index perturbation was `i * 1e-6` cast
to the arg dtype — for integer dtypes (uint8 clips, the flagship wire
format) that truncates to 0, XLA folds the bump away and hoists the
benchmarked op out of the fori_loop, so the timer reads empty-loop
overhead. These tests pin the fix by inspecting the compiled HLO: the
work must live INSIDE the while body for every supported input dtype.
"""

import jax
import jax.numpy as jnp
import pytest

from benchmarks._timing import _bump, timeit


def _matmul(x):
    xf = x.astype(jnp.float32)
    return xf @ xf.T


@pytest.mark.parametrize(
    "dtype", [jnp.uint8, jnp.int32, jnp.bool_, jnp.bfloat16, jnp.float32]
)
def test_perturbation_keeps_work_in_loop(dtype):
    x = jnp.ones((32, 32), dtype)

    # 1) timeit runs end-to-end and returns sane numbers for this dtype.
    ms, compile_s = timeit(_matmul, x, iters=4)
    assert ms > 0 and compile_s > 0

    # 2) The compiled while body contains the matmul: compile the same
    # loop timeit builds (same _bump) and walk the HLO regions.
    iters = 4

    @jax.jit
    def loop(a):
        def body(i, acc):
            return acc + _matmul(_bump(a, i)).astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    hlo = loop.lower(x).compile().as_text()
    region = None
    dots_in_body = 0
    for line in hlo.splitlines():
        if "ENTRY" in line:
            region = "entry"
        elif "{" in line and ("body" in line or "while" in line):
            region = "body"
        if region == "body" and ("dot(" in line or "dot_general" in line):
            dots_in_body += 1
    assert dots_in_body >= 1, f"matmul hoisted out of the loop for {dtype}"
