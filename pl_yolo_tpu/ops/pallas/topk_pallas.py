"""Pallas TPU kernel: exact top-k along the last dim for small k.

The jnp iterative-extraction top-k (ops/topk.py) re-reads the input from
HBM on every one of its k max/argmax passes (~10 x 134 MB at SimOTA's
[64, 50, 8400]); this kernel loads each row block into VMEM ONCE and runs
all k extractions in-register: traffic drops to a single read. Measured
v5e @ [128, 100, 8400], k=10: 19.9 ms (jnp iterative) -> 2.1 ms.

Tie handling: one element per extraction is removed (the highest-index
maximum); the returned VALUES match a descending sort exactly regardless
of tie order, which is all the SimOTA dynamic-k math consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128


def _topk_kernel(x_ref, out_ref, *, k: int):
    # Distinct-value extraction: per pass take the row max, count its ties,
    # fill that many output slots, and erase ALL ties — one max + one sum
    # reduce per pass (no argmax pass), and k passes always suffice since
    # every pass either fills >= 1 slot or the row is exhausted (-inf).
    cur = x_ref[...]                                       # (rb, A) f32
    rb, _ = cur.shape
    kio = jax.lax.broadcasted_iota(jnp.int32, (rb, k), 1)
    filled = jnp.zeros((rb, 1), jnp.int32)
    out = jnp.full((rb, k), -jnp.inf, cur.dtype)
    for _t in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)            # (rb, 1)
        tie = cur == m
        cnt = jnp.sum(tie.astype(jnp.int32), axis=1, keepdims=True)
        put = (kio >= filled) & (kio < filled + cnt)
        out = jnp.where(put, m, out)
        filled = filled + cnt
        cur = jnp.where(tie, -jnp.inf, cur)
    out_ref[...] = out


def topk_pallas(x: jax.Array, k: int, interpret: bool = False) -> jax.Array:
    """Exact top-k values (descending) along the last dim of x [..., A],
    A > k. Returns [..., k] in x.dtype (compute in f32)."""
    *lead, a = x.shape
    rows = 1
    for d in lead:
        rows *= d
    dtype = x.dtype
    xr = x.reshape(rows, a).astype(jnp.float32)
    pad = (-rows) % ROW_BLOCK
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    nblk = xr.shape[0] // ROW_BLOCK

    out = pl.pallas_call(
        functools.partial(_topk_kernel, k=k),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((ROW_BLOCK, a), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROW_BLOCK, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], k), jnp.float32),
        # the (ROW_BLOCK, A) row block + iota/mask temps overflow the 16 MB
        # default scoped-VMEM budget at A=8400
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xr)
    return out[:rows].reshape(*lead, k).astype(dtype)
