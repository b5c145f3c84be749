"""Hierarchical top-k along the last dim — TPU-fast exact top-k.

XLA's top_k over long rows (e.g. the 8400-anchor axis in SimOTA) lowers to a
full sort; splitting into fixed blocks, taking per-block top-k, then top-k of
the survivors is exact for k <= block and ~2.4x faster at the shapes the
losses use (measured 17ms -> 7ms for [32,50,8400], k=10, block=64)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_lastdim(x: jax.Array, k: int, block: int = 64) -> jax.Array:
    """Exact top-k values (descending) along the last dim. Requires
    k <= block. Returns [..., k]."""
    *lead, a = x.shape
    if a <= block:
        return jax.lax.top_k(x, min(k, a))[0]
    assert k <= block
    pad = (-a) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=-jnp.inf)
    xb = x.reshape(*lead, -1, block)
    tb = jax.lax.top_k(xb, k)[0]
    tb = tb.reshape(*lead, -1)
    return jax.lax.top_k(tb, k)[0]
