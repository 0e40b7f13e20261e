"""Device-side input prefetch: overlap host→device transfer with compute.

The training flows feed uint8 host batches straight into the jitted
step; without lookahead the H2D copy of batch i+1 only starts when the
host calls the step on it, so the device idles for the transfer each
step. :class:`DevicePrefetch` wraps a dataset and keeps ``size`` batches
already PLACED on device (``jax.device_put`` / mesh ``shard_batch`` are
async — they enqueue the copy and return), so the copy of batch i+1
rides under the compute of batch i. This is the jit/GSPMD analogue of
``flax.jax_utils.prefetch_to_device`` (which is pmap-shaped and
inapplicable here).

Position accounting: the wrapper pulls ahead of the trainer, and the
inner datasets count batches when pulled (their consumer-side counting
treats whoever iterates them as the consumer). ``position()`` therefore
reports the inner position minus the batches still held on device,
normalized through the absolute batch index — the same
exactly-what-the-trainer-consumed contract the host-side prefetch keeps
via ``manifest._counted``, so ``save_every_steps`` mid-epoch
checkpoint/resume stays exact with device prefetch on.

The reference has no input pipeline beyond synchronous per-batch host
loads (``/root/reference/FCT.py:300-311`` iterates a DataLoader and
moves tensors inside the step loop); this is part of build-new
component ⊕D (SURVEY §2.1).
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


def _default_place(batch):
    return jax.tree.map(jnp.asarray, batch)


class DevicePrefetch:
    """Iterate ``data`` with ``size`` batches kept pre-placed on device.

    ``place``: host batch -> device batch (default: ``jnp.asarray`` per
    leaf; pass the flow's ``_shard`` for mesh placement). Re-placing the
    yielded batch is a no-op (``device_put`` onto the same sharding does
    not copy), so call sites can stay placement-agnostic.

    Proxies ``len``/``position``/``seek`` so the wrapper can stand in
    for the dataset everywhere, including mid-epoch checkpointing.
    ``size`` extra batches live in HBM — keep it small (2 suffices to
    hide the copy; more only buys slack against host jitter).
    """

    def __init__(self, data, size: int = 2,
                 place: Optional[Callable] = None):
        if size < 1:
            raise ValueError(f"size {size} < 1")
        self.data = data
        self.size = size
        self.place = place or _default_place
        self._buf: Optional[deque] = None

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self) -> Iterator:
        it = iter(self.data)
        buf: deque = deque()
        self._buf = buf
        try:
            for _ in range(self.size):
                try:
                    buf.append(self.place(next(it)))
                except StopIteration:
                    break
            while buf:
                out = buf.popleft()
                try:
                    buf.append(self.place(next(it)))
                except StopIteration:
                    pass
                yield out
        finally:
            # Trainer break/exception: drop lookahead so a later
            # position() doesn't credit batches nobody consumed. The
            # inner iterator's own abandon semantics then apply.
            self._buf = None

    # -- positionable-dataset proxy (preemption-tolerant training) ----
    # position/seek surface through __getattr__ so hasattr() on the
    # wrapper mirrors the inner dataset — the flows feature-detect
    # positionability with hasattr, and a wrapper that always "has"
    # position would turn their graceful skip into a crash on
    # non-positionable data.

    def __getattr__(self, name: str):
        if name == "position" and hasattr(self.data, "position"):
            return self._position
        if name == "seek" and hasattr(self.data, "seek"):
            return self._seek
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}")

    def _held(self) -> int:
        return len(self._buf) if self._buf is not None else 0

    def _position(self) -> dict:
        """The NEXT batch the TRAINER will receive (inner position minus
        device-held lookahead, normalized like the inner datasets: the
        epoch-final batch reports the next epoch's batch 0)."""
        pos = self.data.position()
        spe = len(self.data)
        if spe == 0:
            return pos
        abs_next = pos["epoch"] * spe + pos["batch"] - self._held()
        return {"epoch": abs_next // spe, "batch": abs_next % spe}

    def _seek(self, epoch: int, batch: int = 0) -> None:
        if self._buf is not None:
            raise RuntimeError("seek during iteration: abandon the "
                               "iterator first")
        self.data.seek(epoch, batch)
