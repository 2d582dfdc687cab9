"""Train state pytree + optimizer/schedule factories."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from object_detector_tpu.core.config import TrainConfig


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32
    params: Any
    batch_stats: Any  # BatchNorm running stats ({} for VGG)
    opt_state: Any
    ema_params: Any  # None when EMA disabled


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.base_lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.num_steps,
        )
    if cfg.schedule == "step":
        # Classic SSD step decay: x0.1 at 2/3 and 5/6 of training.
        boundaries = {
            int(cfg.num_steps * 2 / 3): 0.1,
            int(cfg.num_steps * 5 / 6): 0.1,
        }
        base = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
        if cfg.warmup_steps:
            warm = optax.linear_schedule(0.0, cfg.base_lr, cfg.warmup_steps)
            return optax.join_schedules([warm, base], [cfg.warmup_steps])
        return base
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    if cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum, nesterov=False),
        )
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt


def create_train_state(cfg: TrainConfig, variables: Any) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None,
    )
