"""Learning-rate schedules.

Reproduces the reference's classification LR policy
(``adjust_learning_rate``, reference lib/utils.py:7-30): linear warmup by
fractional epoch, then either a 30/60/90-epoch staircase ("linear") or
per-step cosine decay ("cosine"). The live segmentation script uses a constant
LR ("constant"). All schedules are pure functions of the global step so they
can live inside a jitted train step.
"""
from __future__ import annotations

import jax.numpy as jnp


def constant(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def warmup_cosine(base_lr: float, steps_per_epoch: int, total_epochs: int,
                  warmup_epochs: int = 0):
    """Cosine decay over post-warmup steps, matching lib/utils.py:20-26."""
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = max((total_epochs - warmup_epochs) * steps_per_epoch, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        # reference warmup: lr * (fractional_epoch / warmup_epochs)
        warm = base_lr * (step + 1.0) / jnp.maximum(float(warmup_steps), 1.0)
        t = jnp.clip((step - warmup_steps) / float(total_steps), 0.0, 1.0)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def warmup_staircase(base_lr: float, steps_per_epoch: int,
                     warmup_epochs: int = 0):
    """The reference's 'linear' staircase: x1 / x0.1 / x0.01 / x0.001 at
    30/60/90 epochs past warmup (lib/utils.py:11-19)."""
    warmup_steps = warmup_epochs * steps_per_epoch

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / jnp.maximum(float(warmup_steps), 1.0)
        epoch = (step - warmup_steps) / float(steps_per_epoch)
        factor = jnp.where(
            epoch < 30, 1.0,
            jnp.where(epoch < 60, 1e-1, jnp.where(epoch < 90, 1e-2, 1e-3)),
        )
        return jnp.where(step < warmup_steps, warm, base_lr * factor)

    return sched


SCHEDULE_REGISTRY = {
    "constant": constant,
    "cosine": warmup_cosine,
    "linear": warmup_staircase,
}
