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

TPU-first notes: the L encoder blocks are ONE stacked param tree applied by
`lax.scan` (one compiled block body; the per-layer attention maps the CAM
path needs come out as the scan's stacked ys). Like vit.py, the detection
path accepts GPipe pipelining over the ambient mesh's 'pipe' axis
(`parallel: {pipeline: N}`, PIPELINE_TOWER) — the stage function drops the
attention output (only `classify`, which never trains a detector, consumes
it, and it always runs the sequential scan). Position embeddings
interpolate bicubically from the 14x14 native grid (:129-149), once per
compiled shape.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vit import _ln, stacked_init

_trunc = nn.initializers.truncated_normal(0.02)


def mct_block(p, x, num_heads: int):
    """Pre-norm ViT block as a pure function of one layer's param slice;
    also returns the head-resolved attention (for the CAM path)."""
    b, n, c = x.shape
    hd = c // num_heads
    y = _ln(x, p["ln1_scale"], p["ln1_bias"])
    qkv = y @ p["wqkv"] + p["bqkv"]
    q, k, v = [qkv[..., i * c:(i + 1) * c].reshape(b, n, num_heads, hd)
               for i in range(3)]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    attn = jax.nn.softmax(logits * (hd ** -0.5), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
    x = x + out.reshape(b, n, c) @ p["wproj"] + p["bproj"]
    y = _ln(x, p["ln2_scale"], p["ln2_bias"])
    y = nn.gelu(y @ p["w1"] + p["b1"])
    return x + y @ p["w2"] + p["b2"], attn  # attn: [B, heads, N, N]


class MCTformer(nn.Module):
    """DeiT-small defaults (mctformer.py:186-189)."""

    PIPELINE_TOWER = True

    num_classes: int = 80
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    mlp_ratio: float = 4.0
    ref_grid: int = 14               # 224 / 16 pos-embed native grid
    out_strides: Sequence[int] = (8, 16, 32)

    def tower_params(self) -> dict:
        d, L = self.embed_dim, self.depth
        mlp = int(d * self.mlp_ratio)
        trunc = stacked_init(_trunc)
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        spec = {
            "ln1_scale": ((d,), ones), "ln1_bias": ((d,), zeros),
            "wqkv": ((d, 3 * d), trunc), "bqkv": ((3 * d,), zeros),
            "wproj": ((d, d), trunc), "bproj": ((d,), zeros),
            "ln2_scale": ((d,), ones), "ln2_bias": ((d,), zeros),
            "w1": ((d, mlp), trunc), "b1": ((mlp,), zeros),
            "w2": ((mlp, d), trunc), "b2": ((d,), zeros),
        }
        return {k: self.param(f"blocks_{k}", init, (L,) + shape)
                for k, (shape, init) in spec.items()}

    def _apply_tower(self, params: dict, x: jax.Array, collect_attn: bool):
        """Sequential lax.scan (stacked attention ys when collect_attn) or,
        for the detection path under an ambient 'pipe' mesh, the GPipe
        pipeline (attention dropped — identical x math)."""
        from ...parallel.mesh import pipeline_mesh

        mesh = pipeline_mesh()
        S = mesh.shape.get("pipe", 1) if mesh is not None else 1
        if collect_attn or S <= 1 or self.is_initializing():
            def body(carry, p):
                y, a = mct_block(p, carry, self.num_heads)
                return y, (a if collect_attn else None)
            x, attns = jax.lax.scan(body, x, params)
            return x, attns  # attns: [L, B, heads, N, N] or None
        from ...parallel.pipeline import pipeline_apply

        if self.depth % S:
            raise ValueError(
                f"parallel.pipeline={S} must divide MCTformer depth "
                f"{self.depth}")
        stages = jax.tree.map(
            lambda a: a.reshape((S, self.depth // S) + a.shape[1:]), params)

        def stage_fn(sp, xm):
            def body(carry, p):
                return mct_block(p, carry, self.num_heads)[0], None
            y, _ = jax.lax.scan(body, xm, sp)
            return y

        batch_axis = ("data" if mesh.shape.get("data", 1) > 1 else None)
        return pipeline_apply(stage_fn, stages, x, mesh=mesh, axis="pipe",
                              batch_axis=batch_axis), None

    def _encode(self, x: jax.Array, collect_attn: bool = False):
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

        x, attns = self._apply_tower(self.tower_params(), x, collect_attn)
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
        cls_tokens, patches, attns = self._encode(x, collect_attn=True)
        b, h, w, _ = patches.shape

        cam_map = nn.Conv(ncls, (3, 3), name="head")(patches)  # [B,h,w,C]
        patch_logits = jnp.mean(cam_map, axis=(1, 2))
        cls_logits = jnp.mean(cls_tokens, axis=-1)

        # attns [L, B, heads, N, N]: head-mean per layer, sum class->patch
        # slice over the last n_layers (reference :91-95)
        stack = jnp.mean(attns, axis=2)
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
