"""ResTv2 detection backbone.

Capability parity with reference models/backbones/restv2.py:15-277 (ResTv2:
"ResTv2: Simpler, Faster and Stronger", Zhang & Yang 2022), re-designed
NHWC/flax:

  * ConvStem (:233-262): 3x3/s2 conv-BN-ReLU x2 -> 1x1 conv, PA pixel
    attention (:202-210), LayerNorm. Stride-4 tokens.
  * PatchEmbed (:265-277): (p+1)x(p+1)/sp conv + PA + LN between stages.
  * Block (:185-199): pre-norm EMSAv2 attention + 4x MLP, DropPath.
  * EMSAv2 attention (:136-183): full-resolution queries against keys/values
    downsampled by a depthwise (sr+1)x(sr+1)/s-sr conv, PLUS an upsampled
    identity branch: v -> depthwise 3x3 producing sr^2*C channels -> pixel
    shuffle back to full resolution -> LN, added before the output proj.

Deviations (documented, all shape/semantics-preserving for fresh training):
  * everything stays NHWC end-to-end — the reference's BNC<->BCHW permutes
    around every conv disappear; attention reshapes [B,H,W,C]<->[B,N,C]
    only at head split, which XLA folds away.
  * pixel-shuffle channel order is [C, r, r] grouped (a reshape/transpose on
    the depthwise conv output) rather than torch's interleaved NCHW order —
    equivalent up to a fixed permutation of freshly-initialized channels.
  * attention softmax/logits run in fp32 (numerics convention, CLAUDE.md).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.drops import DropPath

_trunc = nn.initializers.truncated_normal(0.02)


class PA(nn.Module):
    """Pixel attention positional encoding: x * sigmoid(dwconv3x3(x))."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gate = nn.Conv(c, (3, 3), feature_group_count=c, name="pa_conv")(x)
        return x * jax.nn.sigmoid(gate)


class ConvStem(nn.Module):
    out_ch: int = 96

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch = self.out_ch // 2
        for i in range(2):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
            ch *= 2
        x = nn.Conv(self.out_ch, (1, 1), name="proj")(x)
        x = PA(name="pos")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class PatchEmbed(nn.Module):
    out_ch: int
    patch: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch
        x = nn.Conv(self.out_ch, (p + 1, p + 1), strides=(p, p),
                    padding=[(p // 2, p // 2)] * 2, name="proj")(x)
        x = PA(name="pos")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class EMSAv2(nn.Module):
    """Efficient multi-head self-attention with sr-downsampled kv and the
    pixel-shuffle upsampled-v identity branch (restv2.py:136-183)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        nh, sr = self.num_heads, self.sr_ratio
        hd = c // nh
        q = nn.Dense(c, name="q")(x).reshape(b, h * w, nh, hd)

        kv_in = x
        if sr > 1:
            kv_in = nn.Conv(c, (sr + 1, sr + 1), strides=(sr, sr),
                            padding=[(sr // 2, sr // 2)] * 2,
                            feature_group_count=c, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_in)
        hk, wk = kv_in.shape[1], kv_in.shape[2]
        kv = nn.Dense(2 * c, name="kv")(kv_in).reshape(b, hk * wk, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * (hd ** -0.5), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = out.reshape(b, h * w, c)

        # identity branch: v back to a spatial map, depthwise-conv to sr^2*C,
        # pixel-shuffle to full resolution
        ident = v.reshape(b, hk, wk, c)
        up = nn.Conv(sr * sr * c, (3, 3), feature_group_count=c,
                     name="up")(ident)
        up = up.reshape(b, hk, wk, c, sr, sr)
        up = up.transpose(0, 1, 4, 2, 5, 3).reshape(b, hk * sr, wk * sr, c)
        up = up[:, :h, :w]  # guard non-divisible maps (never hit at /32 sizes)
        up = nn.LayerNorm(epsilon=1e-6, name="up_norm")(up)

        out = out.reshape(b, h, w, c) + up
        return nn.Dense(c, name="proj")(out)


class RestBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = EMSAv2(self.dim, self.num_heads, self.sr_ratio, name="attn")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(4 * self.dim, kernel_init=_trunc, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, kernel_init=_trunc, name="fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=not train)


class ResTV2(nn.Module):
    """Four-stage pyramid (strides 4/8/16/32); returns out_features maps."""

    depths: Sequence[int] = (1, 2, 6, 2)           # tiny
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.0
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        import numpy as np
        dpr = [float(r) for r in          # static ramp — numpy, not jnp:
               np.linspace(0.0, self.drop_path_rate, sum(self.depths))]
        feats, cur = {}, 0
        for s in range(4):
            if s == 0:
                x = ConvStem(self.embed_dims[0], name="stem")(x, train)
            else:
                x = PatchEmbed(self.embed_dims[s], 2, name=f"patch_{s + 1}")(x)
            for i in range(self.depths[s]):
                x = RestBlock(self.embed_dims[s], self.num_heads[s],
                              self.sr_ratios[s], dpr[cur + i],
                              name=f"stage{s + 1}_block{i}")(x, train)
            cur += self.depths[s]
            if s == 3:
                x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
            feats[f"stage{s + 1}"] = x
        return [feats[k] for k in self.outputs]
