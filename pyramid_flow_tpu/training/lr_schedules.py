"""LR schedules matching the reference's precomputed per-iteration tables
(`trainer_misc/utils.py:110-146`), expressed as optax-style callables."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

__all__ = ["cosine_schedule", "constant_with_warmup"]


def cosine_schedule(base_lr: float, final_lr: float, steps_per_epoch: int,
                    epochs: int, warmup_steps: int = 0,
                    warmup_start_lr: float = 0.0):
    """Linear warmup then cosine decay to ``final_lr`` (reference
    ``cosine_scheduler``)."""
    total = epochs * steps_per_epoch

    def fn(step):
        step = jnp.minimum(step, total - 1)
        warm = warmup_start_lr + step / jnp.maximum(warmup_steps, 1) * (
            base_lr - warmup_start_lr)
        prog = (step - warmup_steps) / jnp.maximum(total - warmup_steps, 1)
        cos = final_lr + 0.5 * (base_lr - final_lr) * (
            1 + jnp.cos(math.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def constant_with_warmup(base_lr: float, warmup_steps: int = 0,
                         warmup_start_lr: float = 0.0):
    """Linear warmup then constant (reference ``constant_scheduler``)."""

    def fn(step):
        warm = warmup_start_lr + step / jnp.maximum(warmup_steps, 1) * (
            base_lr - warmup_start_lr)
        return jnp.where(step < warmup_steps, warm, base_lr)

    return fn
