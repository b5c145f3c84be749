"""MCTformer: multi-class-token Vision Transformer.

Capability parity with reference
models/backbones/vision_transformer/mctformer.py:16-112 (MCTformerV2,
"Multi-class Token Transformer for Weakly Supervised Semantic
Segmentation", Xu et al. 2022): a DeiT-small encoder carrying C class
tokens (one per class) whose class-to-patch attention, fused with the
patch-token CAM head, yields class activation maps.

The reference model is a classifier/WSSS model (returns class logits +
CAMs) and is never wired into a detector there. Here it serves BOTH roles:

  * `__call__` (detection-backbone protocol) runs the encoder and returns a
    ViTDet-style simple pyramid (stride 8/16/32) built from the PATCH
    tokens — same adaptation vit.py uses, so every neck/head accepts it.
  * `classify` reproduces MCTformerV2.forward (:70-108): class-token
    logits (mean over embed dim), patch logits (3x3 conv head + GAP), and
    fused CAMs = (class->patch attention, summed over the last n_layers,
    mean over heads) * relu(patch CAM head output).

TPU-first notes: attention weights for the CAM path are returned by a
hand-written block (flax's MHA doesn't expose them); all-layer weights are
stacked via a static Python loop (depth=12 unrolled under jit); position
embeddings interpolate bicubically from the 14x14 native grid
(:129-149), done once per compiled shape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_trunc = nn.initializers.truncated_normal(0.02)


class MCTBlock(nn.Module):
    """Pre-norm ViT block that also returns head-resolved attention."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, kernel_init=_trunc, name="qkv")(y)
        q, k, v = [qkv[..., i * c:(i + 1) * c].reshape(b, n, nh, hd)
                   for i in range(3)]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits * (hd ** -0.5), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = nn.Dense(c, kernel_init=_trunc,
                       name="proj")(out.reshape(b, n, c))
        x = x + out
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), kernel_init=_trunc,
                     name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, kernel_init=_trunc, name="fc2")(y)
        return x + y, attn  # attn: [B, heads, N, N]


class MCTformer(nn.Module):
    """DeiT-small defaults (mctformer.py:186-189)."""

    num_classes: int = 80
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    mlp_ratio: float = 4.0
    ref_grid: int = 14               # 224 / 16 pos-embed native grid
    out_strides: Sequence[int] = (8, 16, 32)

    def _encode(self, x: jax.Array):
        """Shared trunk: patch embed + C class tokens + pos embed + blocks.
        Returns (class tokens [B,C,D], patch map [B,h,w,D], attn stack)."""
        b, H, W, _ = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        ncls = self.num_classes
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = x.reshape(b, h * w, self.embed_dim)

        cls_tok = self.param("cls_token", _trunc,
                             (1, ncls, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(
            cls_tok, (b, ncls, self.embed_dim)), x], axis=1)

        pos_cls = self.param("pos_embed_cls", _trunc,
                             (1, ncls, self.embed_dim))
        pos_patch = self.param(
            "pos_embed_patch", _trunc,
            (1, self.ref_grid, self.ref_grid, self.embed_dim))
        pos_patch = jax.image.resize(
            pos_patch, (1, h, w, self.embed_dim), "bicubic")
        x = x + jnp.concatenate(
            [pos_cls, pos_patch.reshape(1, h * w, self.embed_dim)], axis=1)

        attns = []
        for i in range(self.depth):
            x, a = MCTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                            name=f"block{i}")(x)
            attns.append(a)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        patches = x[:, ncls:].reshape(b, h, w, self.embed_dim)
        return x[:, :ncls], patches, attns

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        _, feat, _ = self._encode(x)
        outs = []
        for s in self.out_strides:
            if s == self.patch_size:
                y = feat
            elif s < self.patch_size:
                f = self.patch_size // s
                y = nn.ConvTranspose(self.embed_dim // 2, (f, f),
                                     strides=(f, f), name=f"up{s}")(feat)
            else:
                f = s // self.patch_size
                y = nn.Conv(self.embed_dim, (f, f), strides=(f, f),
                            name=f"down{s}")(feat)
            outs.append(y)
        return outs

    @nn.compact
    def classify(self, x: jax.Array, n_layers: int = 12,
                 attention_type: str = "fused"):
        """MCTformerV2.forward (:70-108): returns (cls_logits [B,C],
        patch_logits [B,C], cams [B,h,w,C])."""
        ncls = self.num_classes
        cls_tokens, patches, attns = self._encode(x)
        b, h, w, _ = patches.shape

        cam_map = nn.Conv(ncls, (3, 3), name="head")(patches)  # [B,h,w,C]
        patch_logits = jnp.mean(cam_map, axis=(1, 2))
        cls_logits = jnp.mean(cls_tokens, axis=-1)

        # [L, B, N, N]: head-mean per layer, sum class->patch slice over the
        # last n_layers (reference :91-95)
        stack = jnp.stack([jnp.mean(a, axis=1) for a in attns])
        mtatt = jnp.sum(stack[-n_layers:, :, :ncls, ncls:], axis=0)
        mtatt = mtatt.reshape(b, ncls, h, w).transpose(0, 2, 3, 1)
        feature_map = jax.lax.stop_gradient(nn.relu(cam_map))
        if attention_type == "fused":
            cams = mtatt * feature_map
        elif attention_type == "patchcam":
            cams = feature_map
        else:
            cams = mtatt
        return cls_logits, patch_logits, cams
