"""Training flows: states, jitted steps, checkpointing, logging, loops."""

from tchvp_tpu.train.state import (
    EmaState,
    TrainState,
    create_train_state,
    ema_params,
    human_param_count,
    lr_at,
    make_lr_schedule,
    make_optimizer,
    param_count,
    param_ema,
    with_ema_params,
)
from tchvp_tpu.train import checkpoint, logging, steps
from tchvp_tpu.train.health import HealthMonitor, TrainingDiverged, recover_latest

__all__ = [
    "HealthMonitor",
    "TrainingDiverged",
    "recover_latest",
    "TrainState",
    "create_train_state",
    "EmaState",
    "ema_params",
    "param_ema",
    "with_ema_params",
    "human_param_count",
    "lr_at",
    "make_lr_schedule",
    "make_optimizer",
    "param_count",
    "checkpoint",
    "logging",
    "steps",
]
