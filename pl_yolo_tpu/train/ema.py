"""Exponential moving average of model state as a pure pytree lerp.

Capability parity with the reference ModelEMA (models/utils/ema.py:22-60):
decay ramp d(t) = decay * (1 - exp(-t/2000)), applied to every float leaf of
the model state (params AND batch stats, as the reference averages the whole
state_dict). Unlike the reference, EMA state is a first-class pytree that is
jit-updated on device each step and included in checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_state, new_state, updates: jax.Array, decay: float = 0.9999):
    """One EMA step. `updates` is the post-increment counter (int array).

    ema <- d * ema + (1 - d) * new,  d = decay * (1 - exp(-updates/2000))
    """
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def leaf(e, n):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return e * d + (1.0 - d) * n.astype(e.dtype)
        return n
    return jax.tree.map(leaf, ema_state, new_state)
