"""Token-style attention plug-ins: Self, SimplifiedSelf, UFO, MUSE, AFT,
MobileViTv2, EMSA, DANet, A2 (double attention) — TPU-native NHWC flax
ports of the corresponding reference zoo modules
(models/layers/attention/{SelfAttention,SimplifiedSelfAttention,
UFOAttention,MUSEAttention,AFT,MobileViTv2Attention,EMSA,DANet,
A2Atttention}.py).

The reference modules operate on [B, N, C] token sequences; here each
module keeps the plug-in registry contract — NHWC in/out, no required
constructor args — by flattening H*W into the token axis internally. All
contractions are dense matmuls (MXU); shapes are static inside jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pick_heads(c: int, want: int = 8) -> int:
    """Largest head count <= `want` that divides the channel width."""
    for h in range(min(want, c), 0, -1):
        if c % h == 0:
            return h
    return 1


class ScaledDotProductAttention(nn.Module):
    """Multi-head self-attention over H*W tokens
    (SelfAttention.py:8-80: fc_q/fc_k/fc_v -> softmax(QK^T/sqrt(d_k))V ->
    fc_o). The reference exposes free-standing q/k/v operands; as a
    spatial plug-in all three come from x."""

    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = _pick_heads(c, self.heads)
        dk = c // h
        t = x.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="fc_q")(t).reshape(b, -1, h, dk)
        k = nn.Dense(c, name="fc_k")(t).reshape(b, -1, h, dk)
        v = nn.Dense(c, name="fc_v")(t).reshape(b, -1, h, dk)
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(dk)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, -1, c)
        out = nn.Dense(c, name="fc_o")(out)
        return out.reshape(b, hh, ww, c)


class SimplifiedSelfAttention(nn.Module):
    """Projection-free multi-head attention
    (SimplifiedSelfAttention.py:8-78): q=k=v=x split into heads, only the
    output projection is learned."""

    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = _pick_heads(c, self.heads)
        dk = c // h
        t = x.reshape(b, hh * ww, h, dk)
        att = jnp.einsum("bnhd,bmhd->bhnm", t, t) / math.sqrt(dk)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, t).reshape(b, -1, c)
        out = nn.Dense(c, name="fc_o")(out)
        return out.reshape(b, hh, ww, c)


class UFOAttention(nn.Module):
    """Softmax-free linear attention (UFOAttention.py:9-71): KV contracted
    first, then XNorm (L2 row normalization scaled by a learned per-head
    gamma) on both KV and Q — O(N) in tokens instead of O(N^2)."""

    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = _pick_heads(c, self.heads)
        dk = c // h
        t = x.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="fc_q")(t).reshape(b, -1, h, dk)
        k = nn.Dense(c, name="fc_k")(t).reshape(b, -1, h, dk)
        v = nn.Dense(c, name="fc_v")(t).reshape(b, -1, h, dk)
        gamma = self.param("gamma", nn.initializers.normal(1.0), (1, h, 1, 1))

        def xnorm(u):
            n = jnp.sqrt(jnp.sum(u * u, axis=-1, keepdims=True) + 1e-9)
            return u * gamma / n

        kv = jnp.einsum("bnhd,bnhe->bhde", k, v)            # [B,h,dk,dk]
        out = jnp.einsum("bhnd,bhde->bnhe",
                         xnorm(jnp.swapaxes(q, 1, 2)), xnorm(kv))
        out = nn.Dense(c, name="fc_o")(out.reshape(b, -1, c))
        return out.reshape(b, hh, ww, c)


class MUSEAttention(nn.Module):
    """Self-attention in parallel with depthwise-separable 1D convs over
    the token axis, mixed by softmaxed dynamic weights
    (MUSEAttention.py:8-110). Deviation: the reference re-wraps its
    `dy_paras` in a new nn.Parameter every forward (a torch bug that
    freezes the softmax into the parameter); here the raw 3-vector is a
    parameter and the softmax is part of the forward computation."""

    heads: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = _pick_heads(c, self.heads)
        dk = c // h
        t = x.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="fc_q")(t).reshape(b, -1, h, dk)
        k = nn.Dense(c, name="fc_k")(t).reshape(b, -1, h, dk)
        v = nn.Dense(c, name="fc_v")(t).reshape(b, -1, h, dk)
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(dk)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, -1, c)
        out = nn.Dense(c, name="fc_o")(out)

        # conv branch over tokens: depthwise k + pointwise 1 for k in 1,3,5
        v2 = v.reshape(b, -1, c)
        branches = []
        for ksz in (1, 3, 5):
            u = v2
            if ksz > 1:
                u = nn.Conv(c, (ksz,), feature_group_count=c,
                            name=f"dw{ksz}")(u)
            u = nn.Conv(c, (1,), name=f"pw{ksz}")(u)
            branches.append(u)
        w = jax.nn.softmax(self.param(
            "dy_paras", nn.initializers.ones, (3,)))
        out = out + sum(w[i] * branches[i] for i in range(3))
        return out.reshape(b, hh, ww, c)


class AFTFull(nn.Module):
    """Attention Free Transformer, full variant (AFT.py:8-62):
    out = sigmoid(Q) * sum_j softmax_j(K_j + w_ij) V_j with a learned
    [N, N] pairwise position bias. Deviation: the reference exponentiates
    raw K + bias; here the weights are computed as a max-subtracted
    softmax over j (identical value, stable in bf16)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        t = x.reshape(b, n, c)
        q = nn.Dense(c, name="fc_q")(t)
        k = nn.Dense(c, name="fc_k")(t)
        v = nn.Dense(c, name="fc_v")(t)
        w = self.param("position_biases", nn.initializers.ones, (n, n))
        # logits[b,i,j,c] = k[b,j,c] + w[i,j]; softmax over j
        logits = k[:, None, :, :] + w[None, :, :, None]
        att = jax.nn.softmax(logits, axis=2)
        out = jnp.einsum("bijc,bjc->bic", att, v)
        out = jax.nn.sigmoid(q) * out
        return out.reshape(b, hh, ww, c)


class MobileViTv2Attention(nn.Module):
    """Separable self-attention (MobileViTv2Attention.py:8-57): a single
    learned context score per token -> softmax over tokens -> global
    context vector gates the values. O(N) tokens, all matmuls."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        t = x.reshape(b, hh * ww, c)
        i = nn.Dense(1, name="fc_i")(t)                     # [B,N,1]
        weight_i = jax.nn.softmax(i, axis=1)
        context = jnp.sum(weight_i * nn.Dense(c, name="fc_k")(t),
                          axis=1, keepdims=True)            # [B,1,C]
        v = nn.Dense(c, name="fc_v")(t) * context
        out = nn.Dense(c, name="fc_o")(v)
        return out.reshape(b, hh, ww, c)


class EMSA(nn.Module):
    """Efficient multi-head self-attention from ResT (EMSA.py:8-100):
    K/V come from a strided depthwise conv + LayerNorm spatial reduction;
    optionally the attention map is re-mixed by a 1x1 conv across heads,
    softmaxed, and instance-normalized (`apply_transform`)."""

    heads: int = 8
    ratio: int = 2
    apply_transform: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = _pick_heads(c, self.heads)
        dk = c // h
        t = x.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="fc_q")(t).reshape(b, -1, h, dk)
        if self.ratio > 1:
            pad = self.ratio // 2
            red = nn.Conv(c, (self.ratio + 1, self.ratio + 1),
                          strides=(self.ratio, self.ratio),
                          padding=((pad, pad), (pad, pad)),
                          feature_group_count=c, name="sr_conv")(x)
            red = nn.LayerNorm(name="sr_ln")(
                red.reshape(b, -1, c))
        else:
            red = t
        k = nn.Dense(c, name="fc_k")(red).reshape(b, -1, h, dk)
        v = nn.Dense(c, name="fc_v")(red).reshape(b, -1, h, dk)
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(dk)
        if self.apply_transform and h > 1:
            # 1x1 conv across the head axis, then softmax + InstanceNorm
            att = jnp.moveaxis(att, 1, -1)                  # [B,nq,m,h]
            att = nn.Dense(h, use_bias=True, name="head_mix")(att)
            att = jnp.moveaxis(att, -1, 1)                  # [B,h,nq,m]
            att = jax.nn.softmax(att, axis=-1)
            mu = jnp.mean(att, axis=(2, 3), keepdims=True)
            var = jnp.var(att, axis=(2, 3), keepdims=True)
            att = (att - mu) * jax.lax.rsqrt(var + 1e-5)
        else:
            att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, -1, c)
        out = nn.Dense(c, name="fc_o")(out)
        return out.reshape(b, hh, ww, c)


class DAModule(nn.Module):
    """Dual attention from DANet (DANet.py:8-56): a position branch (3x3
    conv then single-head token self-attention) plus a channel branch (3x3
    conv then projection-free attention over CHANNEL tokens of dim H*W),
    summed."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        ks = (self.kernel_size, self.kernel_size)
        # position attention: tokens are pixels
        y = nn.Conv(c, ks, name="pos_cnn")(x).reshape(b, n, c)
        q = nn.Dense(c, name="pos_q")(y)
        k = nn.Dense(c, name="pos_k")(y)
        v = nn.Dense(c, name="pos_v")(y)
        att = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k) / math.sqrt(c), axis=-1)
        p_out = nn.Dense(c, name="pos_o")(jnp.einsum("bnm,bmc->bnc", att, v))
        # channel attention: tokens are channels, dim = H*W, no projections
        z = nn.Conv(c, ks, name="ch_cnn")(x).reshape(b, n, c)
        z = jnp.swapaxes(z, 1, 2)                           # [B,C,N]
        catt = jax.nn.softmax(
            jnp.einsum("bcn,bdn->bcd", z, z) / math.sqrt(n), axis=-1)
        c_out = nn.Dense(n, name="ch_o")(jnp.einsum("bcd,bdn->bcn", catt, z))
        return (p_out + jnp.swapaxes(c_out, 1, 2)).reshape(b, hh, ww, c)


class DoubleAttention(nn.Module):
    """A2-Nets double attention (A2Atttention.py:9-55): gather global
    descriptors with spatial-softmaxed maps, redistribute with
    channel-softmaxed vectors. Deviation: the reference calls F.softmax
    without a dim on 3D views (torch's deprecated implicit-dim picks the
    batch axis); here the A2-Net paper axes are used — attention maps
    softmax over H*W, distribution vectors softmax over c_n."""

    reduction: int = 4
    reconstruct: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        cm = max(c // self.reduction, 1)
        cn = max(c // self.reduction, 1)
        a = nn.Conv(cm, (1, 1), name="convA")(x).reshape(b, -1, cm)
        bb = nn.Conv(cn, (1, 1), name="convB")(x).reshape(b, -1, cn)
        v = nn.Conv(cn, (1, 1), name="convV")(x).reshape(b, -1, cn)
        att_maps = jax.nn.softmax(bb, axis=1)               # over tokens
        att_vecs = jax.nn.softmax(v, axis=2)                # over c_n
        # global descriptors [B, cm, cn], then distribute back to tokens
        g = jnp.einsum("bnm,bnk->bmk", a, att_maps)
        z = jnp.einsum("bmk,bnk->bnm", g, att_vecs)
        if self.reconstruct:
            z = nn.Dense(c, name="conv_reconstruct")(z)
        return z.reshape(b, hh, ww, c)
