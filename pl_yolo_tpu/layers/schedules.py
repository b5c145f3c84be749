"""LR schedules (reference models/layers/lr_scheduler.py:5-19)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(base_lr: float, warmup_steps: float, max_steps: int):
    """Cosine decay over `max_steps` with a linear warmup multiplier.

    Matches the reference CosineWarmupScheduler.get_lr_factor
    (lr_scheduler.py:15-19): factor = 0.5*(1+cos(pi*step/max_steps)),
    multiplied by (step + 1e-5)/warmup_steps while step <= warmup_steps.
    Returns an optax-style schedule fn: step -> lr.
    """
    warmup_steps = max(float(warmup_steps), 1e-8)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_steps))
        warm = (step + 1e-5) / warmup_steps
        factor = jnp.where(step <= warmup_steps, factor * warm, factor)
        return base_lr * factor

    return schedule
