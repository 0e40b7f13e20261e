"""Train state: params + optimizer + batch stats + PRNG, and subtree freezing.

Covers the reference's checkpoint-dict contents (``FCT.py:368-373``:
epoch/model/optimizer/loss) and its transfer-learning trick — freezing the
pretrained encoder and training a fresh decoder (recovered ``AE_32K.py``
L233-245) — via an optax ``multi_transform`` that zeroes updates for frozen
subtrees.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + mutable BatchNorm stats + a carried PRNG key."""

    batch_stats: Any = None
    rng: Optional[jax.Array] = None


def _dealias_opt_state(params: Any, opt_state: Any) -> Any:
    """Copy any optimizer-state leaf that aliases a parameter buffer (or
    another opt-state leaf). optax transforms initialize state AS the
    param tree itself — ``param_ema``'s init returns the params
    (``jnp.asarray`` is a no-op on jax arrays) and ``apply_if_finite``
    keeps ``last_finite = params`` — so the freshly created train state
    holds the SAME buffer in two leaves and the donated train step dies
    with "Attempt to donate the same buffer twice in Execute()"."""
    seen = {id(l) for l in jax.tree.leaves(params)}

    def unalias(leaf):
        if isinstance(leaf, jax.Array):
            if id(leaf) in seen:
                return jnp.array(leaf, copy=True)
            seen.add(id(leaf))
        return leaf

    return jax.tree.map(unalias, opt_state)


def create_train_state(
    model,
    example_input: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    variables = model.init(rng, example_input, **(init_kwargs or {}))
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
        rng=rng,
    )
    return state.replace(
        opt_state=_dealias_opt_state(state.params, state.opt_state)
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
    ema_decay: float = 0.0,
    optimizer: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW by default (the reference's optimizer everywhere: FCT.py:305,
    Model.py:153, AE_32K L250) with optional global-norm clipping and
    frozen subtrees.

    ``optimizer``: "adamw" (reference parity) | "adam" (no decoupled
    weight decay) | "sgd" (momentum 0.9, nesterov) | "lion" (sign-based;
    ~1/2 the optimizer-state HBM of Adam — one moment instead of two,
    which FSDP sharding and checkpoints inherit for free).

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

    ``ema_decay`` > 0 chains :func:`param_ema` — EMA of the params rides
    in the optimizer state (read back with :func:`ema_params`). Placed
    after any frozen-subtree transform (the EMA tracks what actually
    updates) and inside ``apply_if_finite`` (a skipped bad step must not
    pollute the average).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    lr_sched = make_lr_schedule(
        lr, schedule, warmup_steps, total_steps, min_lr_ratio
    )
    if optimizer == "adamw":
        core = optax.adamw(lr_sched, weight_decay=weight_decay)
    elif optimizer == "adam":
        core = optax.adam(lr_sched)
    elif optimizer == "sgd":
        core = optax.sgd(lr_sched, momentum=0.9, nesterov=True)
    elif optimizer == "lion":
        core = optax.lion(lr_sched, weight_decay=weight_decay)
    else:
        raise ValueError(
            f"unknown optimizer {optimizer!r} (adamw, adam, sgd, lion)"
        )
    chain.append(core)
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
    if ema_decay > 0.0:
        tx = optax.chain(tx, param_ema(ema_decay))
    if skip_nonfinite_updates > 0:
        tx = optax.apply_if_finite(tx, skip_nonfinite_updates)
    return tx


class EmaState(NamedTuple):
    """Exponential moving average of the PARAMETERS, kept inside the
    optimizer state so it checkpoints/restores/shards with zero extra
    plumbing (``checkpoint.py::_retype`` matches fields by name;
    ``parallel/fsdp.py`` shards it like the params it mirrors)."""

    ema: Any


def param_ema(decay: float) -> optax.GradientTransformation:
    """Polyak/EMA parameter averaging as an optax transformation.

    Build-new (the reference keeps no parameter averages): chained AFTER
    the optimizer core, it passes updates through untouched and tracks
    ``ema = decay*ema + (1-decay)*(params + updates)`` — the post-update
    parameters, since optax applies updates additively. Serve/eval with
    :func:`ema_params`.
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init(params):
        # Explicit copies: jnp.asarray is a NO-OP on jax arrays, and an
        # EMA state aliasing the live param buffers breaks donated train
        # steps ("donate the same buffer twice") — see _dealias_opt_state.
        return EmaState(
            ema=jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("param_ema requires params in tx.update")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_params
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def ema_params(opt_state: Any) -> Optional[Any]:
    """Extract the EMA parameter tree from a (possibly wrapped) optimizer
    state, or None when the optimizer has no :class:`EmaState` (search
    recurses through chain/multi_transform/apply_if_finite wrappers)."""
    found = [
        node
        for node in jax.tree.leaves(
            opt_state, is_leaf=lambda x: isinstance(x, EmaState)
        )
        if isinstance(node, EmaState)
    ]
    if not found:
        return None
    return found[0].ema


def with_ema_params(state: "TrainState") -> "TrainState":
    """State with params swapped for their EMA (for eval/serving/export);
    unchanged when the optimizer tracks no EMA."""
    e = ema_params(state.opt_state)
    return state if e is None else state.replace(params=e)


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
