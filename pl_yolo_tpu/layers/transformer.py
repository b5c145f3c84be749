"""Standalone transformer primitives.

Capability parity with reference models/layers/transformer.py:8-135
(MultiHeadAttention, TransformerLayer) and swin_transformer.py:8-101
(SwinTransformerLayer). The Swin detection backbone
(models/backbones/swin.py) and ViT (backbones/vit.py) embed their own
variants; these standalone modules are the plug-in forms for custom
architectures."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.backbones.swin import SwinBlock, window_partition, window_reverse  # noqa: F401


class MultiHeadAttention(nn.Module):
    """Standard MHA over [B, N, C] tokens (reference transformer.py:8-63)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * head_dim**-0.5, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class TransformerLayer(nn.Module):
    """Pre-norm encoder block: MHA + MLP with residuals
    (reference transformer.py:66-135)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(name="norm1")(x)
        x = x + MultiHeadAttention(self.dim, self.num_heads, name="attn")(y)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


SwinTransformerLayer = SwinBlock  # plug-in alias (swin_transformer.py:8-101)
