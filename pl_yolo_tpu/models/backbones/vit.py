"""Vision Transformer detection backbone (ViTDet-style simple pyramid).

Capability parity note: the reference's registered `vision_transformer`
(models/backbones/vision_transformer/vision_transformer.py:100-194) is a
classification ViT that returns only the CLS token — unusable as a
multi-level detection backbone as shipped (it would crash the neck).
Rather than copy that, this is the standard ViTDet adaptation: plain ViT
encoder over 16x16 patches with interpolatable position embeddings
(:136-157), then a simple feature pyramid (deconv x2 / identity / stride-2
conv) producing stride 8/16/32 maps. NHWC, fixed shapes.

TPU-native tower: the L transformer blocks are ONE stacked param tree
(leading axis L, `blocks_*` leaves) applied by `lax.scan` — a single
compiled block body instead of L inlined copies. When the ambient mesh
(parallel/mesh.py::use_pipeline_mesh, set by the Trainer for
`parallel: {pipeline: N}`) carries a non-trivial 'pipe' axis, the same
stacked tree is split into N contiguous stages and the tower runs as a
GPipe pipeline (parallel/pipeline.py) — identical math, identical params,
so checkpoints and eval (which applies sequentially) are unaffected.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def stacked_init(base_init):
    """Stack `L` independent draws of `base_init` along a new leading axis,
    so per-layer fan-in/out statistics match an unstacked tower."""
    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jax.vmap(lambda k: base_init(k, shape[1:], dtype))(keys)
    return init


def _ln(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def moe_ffn(p, y, capacity_factor: float = 1.25):
    """Switch-style top-1 mixture-of-experts FFN — the TPU-native dense
    dispatch formulation: routing becomes two one-hot matmuls (MXU work,
    fixed shapes), never a gather/scatter.

    p["moe_router"]: [d, E]; p["moe_w1"/"moe_b1"/"moe_w2"/"moe_b2"]:
    [E, d, m]/[E, m]/[E, m, d]/[E, d]. Each token goes to its argmax expert,
    scaled by the gate probability; each expert processes a fixed-capacity
    buffer C = ceil(capacity_factor * tokens / E) and tokens over capacity
    contribute zero (the residual around the FFN passes them through —
    standard Switch semantics). Under `parallel: {expert: N}` the leading E
    axis of the expert weights shards over the 'expert' mesh axis
    (parallel/mesh.py::shard_tp) and GSPMD partitions the [E, C, ...] expert
    buffers to match, so each device runs only its own experts' FFNs.

    The Switch load-balancing auxiliary loss is intentionally omitted: this
    is an extension beyond the reference (which has no MoE), and threading an
    aux scalar out of the scanned tower would complicate every loss plumbing
    path; with few experts over dense vision tokens the router stays
    healthy in practice. Router math runs in fp32 (softmax/cumsum).
    """
    n_b, t, d = y.shape
    E = p["moe_router"].shape[-1]
    n = n_b * t
    C = -(-int(n * capacity_factor) // E)
    yt = y.reshape(n, d)
    logits = yt.astype(jnp.float32) @ p["moe_router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)            # [n, E]
    gate = jnp.max(probs, axis=-1)                     # [n]
    onehot = jax.nn.one_hot(jnp.argmax(probs, -1), E, dtype=jnp.float32)
    # position of each token inside its expert's capacity buffer
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0    # [n, E]; -1 if unrouted
    keep = onehot * (pos >= 0.0) * (pos < C)
    disp = keep[:, :, None] * jax.nn.one_hot(
        jnp.clip(pos, 0, C - 1).astype(jnp.int32), C, dtype=jnp.float32)
    expert_in = jnp.einsum("nec,nd->ecd", disp.astype(y.dtype), yt)
    h = jax.nn.gelu(jnp.einsum("ecd,edm->ecm", expert_in, p["moe_w1"])
                    + p["moe_b1"][:, None, :])
    out = jnp.einsum("ecm,emd->ecd", h, p["moe_w2"]) + p["moe_b2"][:, None, :]
    comb = (disp * gate[:, None, None]).astype(out.dtype)
    return jnp.einsum("nec,ecd->nd", comb, out).reshape(n_b, t, d)


def vit_block(p, x, num_heads: int, moe_capacity: float = 1.25):
    """Pre-LN transformer encoder block as a pure function of one layer's
    param slice (ViTBlock semantics: LN->MHA->res, LN->MLP(gelu)->res).
    With `moe_*` keys in p the MLP is the top-1 MoE FFN above."""
    b, t, d = x.shape
    hd = d // num_heads
    y = _ln(x, p["ln1_scale"], p["ln1_bias"])
    q = (y @ p["wq"] + p["bq"]).reshape(b, t, num_heads, hd)
    k = (y @ p["wk"] + p["bk"]).reshape(b, t, num_heads, hd)
    v = (y @ p["wv"] + p["bv"]).reshape(b, t, num_heads, hd)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, d)
    x = x + o @ p["wo"] + p["bo"]
    y = _ln(x, p["ln2_scale"], p["ln2_bias"])
    if "moe_router" in p:
        return x + moe_ffn(p, y, moe_capacity)
    y = jax.nn.gelu(y @ p["w1"] + p["b1"])
    return x + y @ p["w2"] + p["b2"]


class VisionTransformer(nn.Module):
    """PIPELINE_TOWER: the block tower accepts GPipe pipelining over the
    ambient mesh's 'pipe' axis (see module docstring)."""

    PIPELINE_TOWER = True

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    ref_grid: int = 14           # pos-embed native grid (224/16)
    out_strides: Sequence[int] = (8, 16, 32)
    moe_experts: int = 0         # >1: MoE FFN (moe_ffn) instead of dense MLP
    moe_capacity: float = 1.25   # per-expert capacity factor

    def tower_params(self) -> dict:
        d, L, E = self.embed_dim, self.depth, self.moe_experts
        mlp = int(d * self.mlp_ratio)
        lecun = stacked_init(nn.initializers.lecun_normal())
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        spec = {
            "ln1_scale": ((d,), ones), "ln1_bias": ((d,), zeros),
            "wq": ((d, d), lecun), "bq": ((d,), zeros),
            "wk": ((d, d), lecun), "bk": ((d,), zeros),
            "wv": ((d, d), lecun), "bv": ((d,), zeros),
            "wo": ((d, d), lecun), "bo": ((d,), zeros),
            "ln2_scale": ((d,), ones), "ln2_bias": ((d,), zeros),
        }
        if E > 1:
            spec.update({
                "moe_router": ((d, E), lecun),
                "moe_w1": ((E, d, mlp), lecun), "moe_b1": ((E, mlp), zeros),
                "moe_w2": ((E, mlp, d), lecun), "moe_b2": ((E, d), zeros),
            })
        else:
            spec.update({
                "w1": ((d, mlp), lecun), "b1": ((mlp,), zeros),
                "w2": ((mlp, d), lecun), "b2": ((d,), zeros),
            })
        return {k: self.param(f"blocks_{k}", init, (L,) + shape)
                for k, (shape, init) in spec.items()}

    def _apply_tower(self, params: dict, x: jax.Array) -> jax.Array:
        from ...parallel.mesh import pipeline_mesh

        def body(carry, p):
            return vit_block(p, carry, self.num_heads,
                             self.moe_capacity), None

        mesh = pipeline_mesh()
        S = mesh.shape.get("pipe", 1) if mesh is not None else 1
        if S <= 1 or self.is_initializing():
            x, _ = jax.lax.scan(body, x, params)
            return x
        from ...parallel.pipeline import pipeline_apply

        if self.depth % S:
            raise ValueError(
                f"parallel.pipeline={S} must divide ViT depth {self.depth}")
        stages = jax.tree.map(
            lambda a: a.reshape((S, self.depth // S) + a.shape[1:]), params)

        def stage_fn(sp, xm):
            y, _ = jax.lax.scan(body, xm, sp)
            return y

        batch_axis = ("data" if mesh.shape.get("data", 1) > 1 else None)
        return pipeline_apply(stage_fn, stages, x, mesh=mesh, axis="pipe",
                              batch_axis=batch_axis)

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

        x = self._apply_tower(self.tower_params(), x)
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
