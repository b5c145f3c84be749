"""TPU-fast exact top-k along the last dim.

XLA's top_k over long rows (e.g. the 8400-anchor axis in SimOTA) lowers to a
full sort (31.7 ms at [64,50,8400], k=10 on v5e). Two exact alternatives:

* iterative max-extraction (k fused max/argmax passes over a carried
  `removed` mask, tie-safe via argmax one-hot): 4.8 ms at the same shape —
  best for the small k the losses use;
* blockwise hierarchy (per-block top-k, then top-k of survivors): 12.0 ms,
  scales to larger k (used when k > ITER_K_MAX).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ITER_K_MAX = 16  # beyond this the k reduce passes outweigh the block sort


def _topk_iter(x: jax.Array, k: int) -> jax.Array:
    """Exact top-k by repeated max-extraction; ties broken by first index
    (same ordering as a stable descending sort)."""
    removed = jnp.zeros(x.shape, bool)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    outs = []
    for _ in range(k):
        cur = jnp.where(removed, -jnp.inf, x)
        outs.append(jnp.max(cur, axis=-1))
        idx = jnp.argmax(cur, axis=-1)
        removed = removed | (iota == idx[..., None])
    return jnp.stack(outs, axis=-1)


def topk_lastdim(x: jax.Array, k: int, block: int = 64) -> jax.Array:
    """Exact top-k values (descending) along the last dim. Returns [..., k]."""
    *lead, a = x.shape
    if a <= block:
        return jax.lax.top_k(x, min(k, a))[0]
    if k <= ITER_K_MAX:
        if jax.default_backend() == "tpu":
            # VMEM-resident extraction: one HBM read instead of k
            # (ops/pallas/topk_pallas.py; 19.9 -> 2.1 ms @ [128,100,8400])
            from .pallas.topk_pallas import topk_pallas

            return topk_pallas(x, k)
        return _topk_iter(x, k)
    assert k <= block
    pad = (-a) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)],
                    constant_values=-jnp.inf)
    xb = x.reshape(*lead, -1, block)
    tb = jax.lax.top_k(xb, k)[0]
    tb = tb.reshape(*lead, -1)
    return jax.lax.top_k(tb, k)[0]
