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
from typing import Iterator, List, Set

# One set per active capture scope: markers record into ALL of them, so
# nested captures (e.g. a test wrapping dryrun_multichip, which captures
# internally) neither wipe the outer scope's markers nor leak inner
# markers past their own scope boundary incorrectly.
_scopes: List[Set[str]] = []


def record(name: str) -> None:
    """Mark that the named core was traced (no-op outside capture())."""
    for scope in _scopes:
        scope.add(name)


@contextlib.contextmanager
def capture() -> Iterator[Set[str]]:
    """Enable recording; yields this scope's live set of marker names."""
    scope: Set[str] = set()
    _scopes.append(scope)
    try:
        yield scope
    finally:
        _scopes.remove(scope)
