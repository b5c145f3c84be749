"""Structured dropout: DropBlock2d and DropPath (stochastic depth).

Capability parity with reference models/layers/drops.py:22-168. Pure
functions taking an explicit PRNG key (flax modules thread it via the
'dropout' rng collection when used inside networks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def drop_path(rng: jax.Array, x: jax.Array, rate: float,
              deterministic: bool = False) -> jax.Array:
    """Stochastic depth: zero the whole residual branch per sample and
    rescale survivors (reference DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


def drop_block_2d(rng: jax.Array, x: jax.Array, rate: float,
                  block_size: int = 7, deterministic: bool = False) -> jax.Array:
    """DropBlock: drop contiguous block_size x block_size spatial regions
    (reference DropBlock2d). x: [B, H, W, C]."""
    if deterministic or rate == 0.0:
        return x
    b, h, w, c = x.shape
    # gamma: seed-probability so the expected dropped fraction == rate
    gamma = (rate * h * w
             / (block_size ** 2)
             / max((h - block_size + 1) * (w - block_size + 1), 1))
    seeds = jax.random.bernoulli(rng, gamma, (b, h, w, c)).astype(jnp.float32)
    # expand each seed to a block via max-pool
    pad = block_size // 2
    block = jax.lax.reduce_window(
        seeds, 0.0, jax.lax.max,
        window_dimensions=(1, block_size, block_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=[(0, 0), (pad, pad), (pad, pad), (0, 0)])
    mask = 1.0 - block
    denom = jnp.maximum(jnp.mean(mask), 1e-6)
    return x * mask / denom


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        return drop_path(self.make_rng("dropout"), x, self.rate)


class DropBlock2d(nn.Module):
    rate: float = 0.0
    block_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        return drop_block_2d(self.make_rng("dropout"), x, self.rate,
                             self.block_size)
