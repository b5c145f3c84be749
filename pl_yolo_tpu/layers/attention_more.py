"""Mid-weight attention plug-ins: BAM, Triplet, SK, External, Polarized
(parallel PSA), SGE, CoT, ParNet, S2-MLP — TPU-native NHWC flax ports of
the corresponding reference zoo modules (models/layers/attention/{BAM,
TripletAttention,SKAttention,ExternalAttention,PolarizedSelfAttention,SGE,
CoTAttention,ParNetAttention,S2Attention}.py).

All modules preserve [B, H, W, C], take no required constructor args (the
plug-in registry contract), and express their contractions as dense
matmuls/convs (MXU) with channel reductions over the trailing axis."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BAM(nn.Module):
    """Bottleneck attention (BAM.py:11-65): x * (1 + sigmoid(chan + spat)).
    Channel branch: GAP -> MLP (num_layers reduced Dense + BN). Spatial
    branch: 1x1 reduce -> dilated 3x3 convs -> 1x1 to a single map."""

    reduction: int = 16
    num_layers: int = 3
    dia_val: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        red = max(c // self.reduction, 1)
        # channel branch
        s = jnp.mean(x, axis=(1, 2))
        for i in range(self.num_layers):
            s = nn.Dense(red, name=f"ca_fc{i}")(s)
            s = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"ca_bn{i}")(s))
        s = nn.Dense(c, name="ca_out")(s)[:, None, None, :]
        # spatial branch (dilated receptive field)
        t = nn.Conv(red, (1, 1), name="sa_reduce")(x)
        t = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="sa_bn0")(t))
        for i in range(2):
            t = nn.Conv(red, (3, 3), kernel_dilation=(self.dia_val,) * 2,
                        name=f"sa_conv{i}")(t)
            t = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"sa_bn{i + 1}")(t))
        t = nn.Conv(1, (1, 1), name="sa_out")(t)
        return x * (1.0 + jax.nn.sigmoid(s + t))


class TripletAttention(nn.Module):
    """Rotate-to-interact triplet (TripletAttention.py:25-60): three branches
    each Z-pool (max+mean over one axis pair) -> 7x7 conv -> sigmoid gate,
    averaged. Rotations become transposes in NHWC."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def gate(y, name):
            z = jnp.stack([jnp.max(y, axis=-1), jnp.mean(y, axis=-1)], -1)
            a = nn.Conv(1, (7, 7), use_bias=False, name=name)(z)
            a = nn.BatchNorm(use_running_average=True, use_bias=False,
                             use_scale=False, name=name + "_bn")(a)
            return y * jax.nn.sigmoid(a)

        # branch 1: interact (C, W) — rotate H<->C
        b1 = gate(x.transpose(0, 3, 2, 1), "cw").transpose(0, 3, 2, 1)
        # branch 2: interact (H, C) — rotate W<->C
        b2 = gate(x.transpose(0, 1, 3, 2), "hc").transpose(0, 1, 3, 2)
        # branch 3: spatial (H, W)
        b3 = gate(x, "hw")
        return (b1 + b2 + b3) / 3.0


class SKAttention(nn.Module):
    """Selective kernel (SKAttention.py:11-60): multi-size conv branches
    fused by a GAP -> reduce -> per-branch Dense softmax."""

    kernels: tuple = (1, 3, 5)
    reduction: int = 16
    L: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        d = max(self.L, c // self.reduction)
        feats = []
        for k in self.kernels:
            f = nn.Conv(c, (k, k), name=f"conv{k}")(x)
            f = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"bn{k}")(f))
            feats.append(f)
        u = sum(feats)
        s = nn.Dense(d, name="fc_reduce")(jnp.mean(u, axis=(1, 2)))
        logits = [nn.Dense(c, name=f"fc{k}")(s) for k in self.kernels]
        w = jax.nn.softmax(jnp.stack(logits, 1), axis=1)    # [B, n, C]
        return sum(feats[i] * w[:, i][:, None, None, :]
                   for i in range(len(feats)))


class ExternalAttention(nn.Module):
    """Two shared memory units replace K/V (ExternalAttention.py:10-36):
    attn = softmax(x @ Mk) with double normalization, out = attn @ Mv."""

    S: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        attn = nn.Dense(self.S, use_bias=False, name="mk")(t)
        attn = jax.nn.softmax(attn, axis=1)                 # over tokens
        attn = attn / (jnp.sum(attn, axis=2, keepdims=True) + 1e-9)
        out = nn.Dense(c, use_bias=False, name="mv")(attn)
        return out.reshape(b, h, w, c)


class PolarizedSelfAttention(nn.Module):
    """Parallel polarized self-attention (PolarizedSelfAttention.py:10-45):
    a channel branch (value x softmaxed spatial query -> 1x1 -> LN ->
    sigmoid) plus a spatial branch (softmaxed pooled query x value ->
    sigmoid map), summed."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        half = max(c // 2, 1)
        # channel-only
        wv = nn.Conv(half, (1, 1), name="ch_wv")(x).reshape(b, h * w, half)
        wq = nn.Conv(1, (1, 1), name="ch_wq")(x).reshape(b, h * w, 1)
        wq = jax.nn.softmax(wq, axis=1)
        wz = jnp.einsum("bnk,bno->bko", wv, wq)[..., 0]     # [B, half]
        cw = nn.Dense(c, name="ch_wz")(wz)
        cw = jax.nn.sigmoid(nn.LayerNorm(name="ln")(cw))[:, None, None, :]
        channel_out = cw * x
        # spatial-only
        sv = nn.Conv(half, (1, 1), name="sp_wv")(x).reshape(b, h * w, half)
        sq = jnp.mean(nn.Conv(half, (1, 1), name="sp_wq")(x), axis=(1, 2))
        sq = jax.nn.softmax(sq, axis=-1)                    # [B, half]
        sw = jnp.einsum("bk,bnk->bn", sq, sv).reshape(b, h, w, 1)
        spatial_out = jax.nn.sigmoid(sw) * x
        return channel_out + spatial_out


class SGE(nn.Module):
    """Spatial group enhance (SGE.py:8-58): per-group similarity of each
    position to the group's global descriptor, standardized over space,
    scaled/shifted by learned per-group params, sigmoid-gated."""

    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.groups
        cg = c // g
        xg = x.reshape(b, h, w, g, cg)
        gap = jnp.mean(xg, axis=(1, 2), keepdims=True)
        t = jnp.sum(xg * gap, axis=-1)                      # [B, H, W, g]
        mu = jnp.mean(t, axis=(1, 2), keepdims=True)
        var = jnp.var(t, axis=(1, 2), keepdims=True)
        # torch .std() is the Bessel-corrected sample std
        n = h * w
        std = jnp.sqrt(var * n / max(n - 1, 1)) + 1e-5
        t = (t - mu) / std
        weight = self.param("weight", nn.initializers.zeros, (1, 1, 1, g))
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, g))
        t = t * weight + bias
        return (xg * jax.nn.sigmoid(t)[..., None]).reshape(b, h, w, c)


class CoTAttention(nn.Module):
    """Contextual transformer (CoTAttention.py:13-50): static 3x3 group-conv
    key context + dynamic per-position value reweighting from a softmaxed
    attention embedding (averaged over the k*k head dim)."""

    kernel_size: int = 3
    factor: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        ks = self.kernel_size
        k1 = nn.Conv(c, (ks, ks), feature_group_count=4, use_bias=False,
                     name="key")(x)
        k1 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                  name="key_bn")(k1))
        v = nn.Conv(c, (1, 1), use_bias=False, name="value")(x)
        v = nn.BatchNorm(use_running_average=not train, name="value_bn")(v)
        y = jnp.concatenate([k1, x], axis=-1)
        a = nn.Conv(2 * c // self.factor, (1, 1), use_bias=False,
                    name="att1")(y)
        a = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="att_bn")(a))
        a = nn.Conv(ks * ks * c, (1, 1), name="att2")(a)
        b, h, w, _ = a.shape
        att = jnp.mean(a.reshape(b, h, w, ks * ks, c), axis=3)
        # softmax over positions (reference flattens h*w to dim -1)
        att = att.reshape(b, h * w, c)
        att = jax.nn.softmax(att, axis=1).reshape(b, h, w, c)
        return k1 + att * v


class ParNetAttention(nn.Module):
    """ParNet block (ParNetAttention.py:10-35): silu(1x1 + 3x3 + SSE-gated
    input)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        x1 = nn.BatchNorm(use_running_average=not train, name="bn1")(
            nn.Conv(c, (1, 1), name="conv1")(x))
        x2 = nn.BatchNorm(use_running_average=not train, name="bn3")(
            nn.Conv(c, (3, 3), name="conv3")(x))
        gate = jax.nn.sigmoid(
            nn.Conv(c, (1, 1), name="sse")(jnp.mean(x, (1, 2),
                                                    keepdims=True)))
        return jax.nn.silu(x1 + x2 + gate * x)


def _spatial_shift(x: jax.Array, order: int) -> jax.Array:
    """S2-MLP quarter-channel shifts (S2Attention.py:7-22) as padded slices
    (the reference mutates in place; jnp.roll would wrap — edge rows keep
    their original values exactly like the torch slicing)."""
    c = x.shape[-1]
    q = c // 4
    def sh(t, axis, d):
        # shift by d with edge hold (non-shifted positions keep originals)
        pad = [(0, 0)] * t.ndim
        if d > 0:
            pad[axis] = (1, 0)
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(0, t.shape[axis])
            return jnp.pad(t, pad, mode="edge")[tuple(sl)]
        pad[axis] = (0, 1)
        sl = [slice(None)] * t.ndim
        sl[axis] = slice(1, t.shape[axis] + 1)
        return jnp.pad(t, pad, mode="edge")[tuple(sl)]
    if order == 1:
        parts = [sh(x[..., :q], 2, 1), sh(x[..., q:2 * q], 2, -1),
                 sh(x[..., 2 * q:3 * q], 1, 1), sh(x[..., 3 * q:], 1, -1)]
    else:
        parts = [sh(x[..., :q], 1, 1), sh(x[..., q:2 * q], 1, -1),
                 sh(x[..., 2 * q:3 * q], 2, 1), sh(x[..., 3 * q:], 2, -1)]
    return jnp.concatenate(parts, axis=-1)


class S2Attention(nn.Module):
    """Spatial-shift MLP attention (S2Attention.py:25-75): expand 3x, three
    shifted branches fused by split attention, project back."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        y = nn.Dense(3 * c, name="mlp1")(x)
        b1 = _spatial_shift(y[..., :c], 1)
        b2 = _spatial_shift(y[..., c:2 * c], 2)
        b3 = y[..., 2 * c:]
        stacked = jnp.stack([b1, b2, b3], axis=1)          # [B, 3, H, W, C]
        a = jnp.sum(stacked, axis=(1, 2, 3))               # [B, C]
        ah = nn.Dense(3 * c, use_bias=False, name="sa_mlp2")(
            nn.gelu(nn.Dense(c, use_bias=False, name="sa_mlp1")(a)))
        bar = jax.nn.softmax(ah.reshape(b, 3, c), axis=1)
        out = jnp.sum(stacked * bar[:, :, None, None, :], axis=1)
        return nn.Dense(c, name="mlp3")(out)
