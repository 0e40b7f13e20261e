"""Tracing / profiling hooks (build-new aux subsystem, survey §5.1).

The reference has no profiler at all — only tqdm bars (``FCT.py:324``,
``Model.py:40``). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device + host activity;
* :class:`StepTimer` — wall-clock per-step stats with compile-step
  exclusion (first step jits), reporting p50/p90 latency and
  steps/frames per second;
* :func:`annotate` — named ``TraceAnnotation`` scopes that show up on the
  trace timeline (host side).

All hooks are no-ops in cost when unused; ``StepTimer`` adds one
``block_until_ready`` per timed step only when ``sync=True``.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view in TensorBoard
    or Perfetto). Wrap a handful of steady-state steps, not the compile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side scope visible on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock statistics.

    Usage::

        timer = StepTimer(skip=1)            # skip the compile step
        for batch in data:
            with timer.step():
                state, metrics = train_step(state, batch)
                timer.sync(metrics["loss"])  # optional: block for accuracy
        print(timer.summary(items_per_step=batch_frames))
    """

    def __init__(self, skip: int = 1):
        self.skip = skip
        self._seen = 0
        self.times: List[float] = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.skip:
            self.times.append(dt)

    @staticmethod
    def sync(x: Any) -> None:
        """Block on a device value so the step time includes device work."""
        jax.block_until_ready(x)

    def summary(self, items_per_step: Optional[int] = None) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        p50 = ts[len(ts) // 2]
        p90 = ts[min(len(ts) - 1, int(len(ts) * 0.9))]
        out = {
            "steps": len(ts),
            "mean_s": statistics.fmean(ts),
            "p50_s": p50,
            "p90_s": p90,
            "steps_per_s": 1.0 / statistics.fmean(ts),
        }
        if items_per_step:
            out["items_per_s"] = items_per_step / statistics.fmean(ts)
        return out

    def reset(self) -> None:
        self._seen = 0
        self.times.clear()
