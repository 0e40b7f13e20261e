"""Trace-time execution markers for the attention dispatch matrix.

Round 2's verdict proved that a dispatch path can be dead code while every
numeric test passes: a fallback computes the same math, so equality
assertions cannot tell WHICH core ran. These markers can. Each attention
core calls :func:`record` with its name at *trace* time (it runs while jit
traces the Python body — zero cost on device); a test wraps the call under
:func:`capture` and asserts the expected marker appeared. Such a test
FAILS when the intended path silently falls back (VERDICT round 2,
next-round items 1/2/4).

Recording is off unless a :func:`capture` scope is active, so production
tracing never touches the global set. jit caches traces per (function,
shapes): a test must trace a *fresh* function (e.g. a new lambda/closure)
inside the capture scope, or the cached trace will record nothing.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Set

_seen: Set[str] = set()
_depth: int = 0


def record(name: str) -> None:
    """Mark that the named core was traced (no-op outside capture())."""
    if _depth:
        _seen.add(name)


@contextlib.contextmanager
def capture() -> Iterator[Set[str]]:
    """Enable recording; yields the live set of marker names seen."""
    global _depth
    _seen.clear()
    _depth += 1
    try:
        yield _seen
    finally:
        _depth -= 1
