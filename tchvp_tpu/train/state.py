"""Train state: params + optimizer + batch stats + PRNG, and subtree freezing.

Covers the reference's checkpoint-dict contents (``FCT.py:368-373``:
epoch/model/optimizer/loss) and its transfer-learning trick — freezing the
pretrained encoder and training a fresh decoder (recovered ``AE_32K.py``
L233-245) — via an optax ``multi_transform`` that zeroes updates for frozen
subtrees.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + mutable BatchNorm stats + a carried PRNG key."""

    batch_stats: Any = None
    rng: Optional[jax.Array] = None


def create_train_state(
    model,
    example_input: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    variables = model.init(rng, example_input, **(init_kwargs or {}))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
        rng=rng,
    )


def make_lr_schedule(
    lr: float,
    schedule: Optional[str] = None,
    warmup_steps: int = 0,
    total_steps: int = 0,
    min_lr_ratio: float = 0.0,
):
    """A scalar LR or an optax schedule (build-new: the reference trains
    at a constant LR everywhere — FCT.py:305, Model.py:153, AE_32K L250
    — so every schedule here is a TPU-build addition, not parity).

    * ``None``/``"constant"``: constant ``lr``, with an optional linear
      warmup from 0 over ``warmup_steps`` (then held).
    * ``"cosine"``: linear warmup over ``warmup_steps`` then cosine decay
      to ``lr * min_lr_ratio`` at ``total_steps`` (required > 0).
    """
    if schedule in (None, "constant"):
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, lr, warmup_steps)
        return lr
    if schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps, end_value=lr * min_lr_ratio
        )
    raise ValueError(f"unknown schedule {schedule!r}")


def lr_at(schedule, step: int) -> float:
    """Current learning rate for logging (scalar schedules included)."""
    if callable(schedule):
        return float(schedule(step))
    return float(schedule)


def make_optimizer(
    lr: float,
    weight_decay: float = 0.01,
    grad_clip_norm: Optional[float] = None,
    frozen_prefixes: Sequence[str] = (),
    skip_nonfinite_updates: int = 0,
    schedule: Optional[str] = None,
    warmup_steps: int = 0,
    total_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW (the reference's optimizer everywhere: FCT.py:305, Model.py:153,
    AE_32K L250) with optional global-norm clipping and frozen subtrees.

    ``frozen_prefixes``: top-level param-tree keys (e.g. ``("encoder",)``)
    whose updates are zeroed — the JAX equivalent of
    ``requires_grad=False`` on the pretrained encoder (AE_32K L237-238).

    ``skip_nonfinite_updates``: > 0 wraps the optimizer in
    ``optax.apply_if_finite(n)`` — a NaN/inf gradient step becomes a no-op
    (in-graph failure protection, survey §5.3 build-new subsystem); after
    ``n`` consecutive bad steps updates pass through again so divergence
    surfaces instead of silently spinning.

    ``schedule``/``warmup_steps``/``total_steps``/``min_lr_ratio``: see
    :func:`make_lr_schedule` (constant LR when unset — reference parity).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    lr_sched = make_lr_schedule(
        lr, schedule, warmup_steps, total_steps, min_lr_ratio
    )
    chain.append(optax.adamw(lr_sched, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if frozen_prefixes:

        def label_fn(params):
            return {
                k: ("frozen" if k in frozen_prefixes else "trainable")
                for k in params.keys()
            }

        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    if skip_nonfinite_updates > 0:
        tx = optax.apply_if_finite(tx, skip_nonfinite_updates)
    return tx


def param_count(params: Any) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))


def human_param_count(n: int) -> str:
    """Pretty-print like the reference (Model.py:150)."""
    units = ["", "K", "M", "B", "T"]
    i = 0
    f = float(n)
    while f >= 1000 and i < len(units) - 1:
        f /= 1000.0
        i += 1
    return f"{f:.2f}{units[i]}"
