"""Vision Transformer detection backbone (ViTDet-style simple pyramid).

Capability parity note: the reference's registered `vision_transformer`
(models/backbones/vision_transformer/vision_transformer.py:100-194) is a
classification ViT that returns only the CLS token — unusable as a
multi-level detection backbone as shipped (it would crash the neck).
Rather than copy that, this is the standard ViTDet adaptation: plain ViT
encoder over 16x16 patches with interpolatable position embeddings
(:136-157), then a simple feature pyramid (deconv x2 / identity / stride-2
conv) producing stride 8/16/32 maps. NHWC, fixed shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=self.qkv_bias, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    ref_grid: int = 14           # pos-embed native grid (224/16)
    out_strides: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        b, H, W, _ = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = x.reshape(b, h * w, self.embed_dim)

        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, self.ref_grid, self.ref_grid, self.embed_dim))
        pos = jax.image.resize(pos, (1, h, w, self.embed_dim), "bicubic")
        x = x + pos.reshape(1, h * w, self.embed_dim)

        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         name=f"block{i}")(x, train)
        x = nn.LayerNorm(name="norm")(x)
        feat = x.reshape(b, h, w, self.embed_dim)   # stride-16 map

        outs = []
        for s in self.out_strides:
            if s == self.patch_size:
                y = feat
            elif s < self.patch_size:     # upsample via transposed conv
                factor = self.patch_size // s
                y = nn.ConvTranspose(self.embed_dim // 2, (factor, factor),
                                     strides=(factor, factor),
                                     name=f"up{s}")(feat)
            else:                         # downsample via strided conv
                factor = s // self.patch_size
                y = nn.Conv(self.embed_dim, (factor, factor),
                            strides=(factor, factor), name=f"down{s}")(feat)
            outs.append(y)
        return outs
