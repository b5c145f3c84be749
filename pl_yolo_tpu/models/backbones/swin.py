"""Swin Transformer multi-scale detection backbone.

Capability parity with reference
models/backbones/vision_transformer/swin_transformer.py:470-650: 4x4 patch
embed, 4 stages of shifted-window attention blocks with PatchMerging between
stages, relative-position-biased window attention (:95-177), per-out-stage
LayerNorm, `out_indices` multi-scale outputs at strides (4, 8, 16, 32).
Used with `neck: none` (configs/model/yolox/yolox_backbones/
swin_transformer_tiny.yaml:9-21).

TPU notes: window partition is reshape/transpose (no gathers); attention is
batched over (windows x batch) so the [49 x 49] attention matmuls batch onto
the MXU; cyclic shifts lower to lax-level rolls. Inputs must be divisible by
(patch 4 x window 7 x 2^stage) — enforced with padding.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.drops import DropPath


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """Relative-position-biased MSA within windows (swin_transformer.py:95-177)."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        bnw, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [bnw, n, h, d]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = _relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    """W-MSA / SW-MSA block (swin_transformer.py:178-277), with stochastic
    depth on both residual branches (reference drop_path, :207,264-266)."""

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
        x = nn.LayerNorm(name="norm1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        windows = window_partition(x, ws)
        windows = WindowAttention(self.dim, self.num_heads, ws,
                                  name="attn")(windows,
                                               attn_mask if self.shift else None)
        x = window_reverse(windows, ws, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = shortcut + dp(x, deterministic=not train)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + dp(y, deterministic=not train)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    """Attention mask for shifted windows (swin_transformer.py:351-377)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, ws_, :] = cnt
            cnt += 1
    windows = np.reshape(img, (1, h // ws, ws, w // ws, ws, 1))
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = windows[:, None, :] - windows[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


class PatchMerging(nn.Module):
    """2x2 patch merge + linear reduce (swin_transformer.py:280-320)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # reference concat order: x0=(0::2,0::2), x1=(1::2,0::2),
        # x2=(0::2,1::2), x3=(1::2,1::2)
        x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: Sequence[int] = (1, 2, 3)
    drop_path_rate: float = 0.0   # linearly ramped over blocks (reference
                                  # swin_transformer.py:529: dpr = linspace)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        b, H, W, _ = x.shape
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
            # pad to window multiple (swin_transformer.py:231-235)
            ph = (ws - h % ws) % ws
            pw = (ws - w % ws) % ws
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hh, ww = x.shape[1], x.shape[2]
            mask = (_shift_attn_mask(hh, ww, ws, shift)
                    if shift > 0 and (hh > ws or ww > ws) else None)
            for bi in range(depth):
                blk_shift = 0 if bi % 2 == 0 else (shift if mask is not None else 0)
                x = SwinBlock(dim, self.num_heads[si], window_size=ws,
                              shift=blk_shift, mlp_ratio=self.mlp_ratio,
                              drop_path_rate=dpr[done + bi],
                              name=f"stage{si}_block{bi}")(
                    x, mask if blk_shift else None, train)
            done += depth
            x = x[:, :h, :w]
            if si in self.out_indices:
                out = nn.LayerNorm(name=f"out_norm{si}")(x)
                outs.append(out)
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{si}")(x)
                dim *= 2
        return outs
