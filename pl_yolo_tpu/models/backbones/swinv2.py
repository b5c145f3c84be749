"""Swin Transformer V2 multi-scale detection backbone.

Capability parity with reference models/backbones/vision_transformer/
swin_transformerv2.py (an unwired experiment there — rebuilt here and
registered): the three V2 changes over V1 are

  * post-normalization: residual = x + norm(f(x)) (swin_transformerv2.py
    res-post-norm placement),
  * scaled cosine attention with a learned per-head temperature
    (logit_scale, clamped at log(100); :87,151-154),
  * log-spaced continuous relative position bias from a 2-layer MLP over
    the log-CPB coordinate table (:90-108,156) instead of a lookup table.

Shares the window partition / shift mask / patch-merging machinery with
the V1 backbone (swin.py) — TPU notes there apply (reshape/transpose
windows, MXU-batched [ws^2 x ws^2] attention, lax-level rolls)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.drops import DropPath
from .swin import (PatchMerging, _shift_attn_mask, window_partition,
                   window_reverse)


def _log_cpb_table(ws: int) -> np.ndarray:
    """Log-spaced relative coordinate table [(2ws-1)^2, 2] in [-1, 1]
    (swin_transformerv2.py:92-108, pretrained_window_size=0 branch)."""
    rng = np.arange(-(ws - 1), ws, dtype=np.float32)
    coords = np.stack(np.meshgrid(rng, rng, indexing="ij"), -1)  # [2w-1,2w-1,2]
    coords = coords / max(ws - 1, 1) * 8.0
    coords = np.sign(coords) * np.log2(np.abs(coords) + 1.0) / np.log2(8.0)
    return coords.reshape(-1, 2)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttentionV2(nn.Module):
    """Scaled-cosine window MSA with continuous relative position bias
    (swin_transformerv2.py:70-170)."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        bw, n, c = x.shape
        hd = c // self.num_heads
        # v2 uses a bias-free qkv with separate q/v bias (k bias zero)
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros,
                                (self.num_heads, hd))
            v_bias = self.param("v_bias", nn.initializers.zeros,
                                (self.num_heads, hd))
            q = q + q_bias[None, None]
            v = v + v_bias[None, None]

        # cosine attention with clamped learned temperature
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn)
        logit_scale = self.param(
            "logit_scale",
            lambda _, shape: jnp.full(shape, float(np.log(10.0))),
            (self.num_heads, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))
        attn = attn * scale[None]

        # continuous position bias: MLP(log-coords) -> per-head table
        table = jnp.asarray(_log_cpb_table(self.window_size))
        hbl = nn.relu(nn.Dense(512, name="cpb_fc1")(table))
        bias_table = nn.Dense(self.num_heads, use_bias=False,
                              name="cpb_fc2")(hbl)        # [(2w-1)^2, nh]
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = bias_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        # v2 squashes the bias through 16*sigmoid (:158)
        bias = 16.0 * jax.nn.sigmoid(bias)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlockV2(nn.Module):
    """V2 block: post-norm residuals (swin_transformerv2.py:200-260)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array | None,
                 train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        windows = window_partition(x, ws)
        windows = WindowAttentionV2(self.dim, self.num_heads, ws,
                                    name="attn")(
            windows, attn_mask if self.shift else None)
        x = window_reverse(windows, ws, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = shortcut + dp(nn.LayerNorm(name="norm1")(x),
                          deterministic=not train)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(x)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + dp(nn.LayerNorm(name="norm2")(y), deterministic=not train)


class SwinTransformerV2(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: Sequence[int] = (1, 2, 3)
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        done = 0
        for si, depth in enumerate(self.depths):
            h, w = x.shape[1], x.shape[2]
            ws = min(self.window_size, h, w)
            shift = ws // 2
            ph = (ws - h % ws) % ws
            pw = (ws - w % ws) % ws
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hh, ww = x.shape[1], x.shape[2]
            mask = (_shift_attn_mask(hh, ww, ws, shift)
                    if shift > 0 and (hh > ws or ww > ws) else None)
            for bi in range(depth):
                blk_shift = 0 if bi % 2 == 0 else (
                    shift if mask is not None else 0)
                x = SwinBlockV2(dim, self.num_heads[si], window_size=ws,
                                shift=blk_shift, mlp_ratio=self.mlp_ratio,
                                drop_path_rate=dpr[done + bi],
                                name=f"stage{si}_block{bi}")(
                    x, mask if blk_shift else None, train)
            done += depth
            x = x[:, :h, :w]
            if si in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{si}")(x))
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{si}")(x)
                dim *= 2
        return outs
