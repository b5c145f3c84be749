"""Plug-in attention module zoo.

Capability parity with the reference's attention collection
(models/layers/attention.py:7-423 — SELayer, SALayer, SKFF, ECALayer, GAM,
CA_Block/CoordAtt, FCA — plus the models/layers/attention/ directory of
plug-ins: CBAM, SimAM, ShuffleAttention, ...). All are channel/spatial
recalibration blocks that drop into CSP layers or necks; NHWC, fixed-shape,
expressed as reductions + 1x1 convs so XLA fuses them into neighbors.

Registry: ATTENTION[name] -> module class taking no required args.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference attention.py SELayer)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(ch // self.reduction, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(ch, name="fc2")(s)
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class ECALayer(nn.Module):
    """Efficient channel attention: 1D conv over the channel profile
    (reference ECALayer)."""
    ksize: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2))                       # [B, C]
        s = nn.Conv(1, (self.ksize,), padding="SAME",
                    name="conv")(s[..., None])[..., 0]     # conv over C
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class SALayer(nn.Module):
    """Spatial attention: channel-pooled 2D map (reference SALayer)."""
    ksize: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = nn.Conv(1, (self.ksize, self.ksize), padding="SAME", name="conv")(s)
        return x * jax.nn.sigmoid(s)


class CBAM(nn.Module):
    """Channel + spatial attention in sequence (reference attention/CBAM)."""
    reduction: int = 16
    ksize: int = 7

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        hidden = max(ch // self.reduction, 1)
        mlp = nn.Sequential([nn.Dense(hidden, name="fc1"), nn.relu,
                             nn.Dense(ch, name="fc2")])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        x = x * jax.nn.sigmoid(avg + mx)[:, None, None, :]
        return SALayer(ksize=self.ksize, name="spatial")(x)


class CoordAtt(nn.Module):
    """Coordinate attention (reference CA_Block): factorized H- and W-
    direction pooling with a shared bottleneck."""
    reduction: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hidden = max(c // self.reduction, 8)
        ph = jnp.mean(x, axis=2)                            # [B, H, C]
        pw = jnp.mean(x, axis=1)                            # [B, W, C]
        y = jnp.concatenate([ph, pw], axis=1)               # [B, H+W, C]
        y = nn.Conv(hidden, (1,), name="conv1")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn")(y)
        y = nn.hard_swish(y)
        ah = jax.nn.sigmoid(nn.Conv(c, (1,), name="conv_h")(y[:, :h]))
        aw = jax.nn.sigmoid(nn.Conv(c, (1,), name="conv_w")(y[:, h:]))
        return x * ah[:, :, None, :] * aw[:, None, :, :]


class SimAM(nn.Module):
    """Parameter-free attention (reference attention/SimAM): neuron energy."""
    lam: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w - 1
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        d = (x - mu) ** 2
        v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
        e = d / (4 * (v + self.lam)) + 0.5
        return x * jax.nn.sigmoid(e)


class ShuffleAttention(nn.Module):
    """Grouped channel+spatial attention with channel shuffle
    (reference attention/ShuffleAttention)."""
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.groups
        cg = c // g
        xg = x.reshape(b, h, w, g, cg)
        x0, x1 = xg[..., :cg // 2], xg[..., cg // 2:]
        # channel branch
        s = jnp.mean(x0, axis=(1, 2), keepdims=True)
        cw = self.param("cweight", nn.initializers.zeros, (1, 1, 1, g, cg // 2))
        cb = self.param("cbias", nn.initializers.ones, (1, 1, 1, g, cg // 2))
        x0 = x0 * jax.nn.sigmoid(s * cw + cb)
        # spatial branch (groupnorm-lite: per-group standardize)
        mu = jnp.mean(x1, axis=(1, 2), keepdims=True)
        var = jnp.var(x1, axis=(1, 2), keepdims=True)
        sn = (x1 - mu) * jax.lax.rsqrt(var + 1e-5)
        sw = self.param("sweight", nn.initializers.zeros, (1, 1, 1, g, cg // 2))
        sb = self.param("sbias", nn.initializers.ones, (1, 1, 1, g, cg // 2))
        x1 = x1 * jax.nn.sigmoid(sn * sw + sb)
        out = jnp.concatenate([x0, x1], axis=-1)            # [b,h,w,g,cg]
        # channel shuffle across groups
        out = out.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c)
        return out


class GAM(nn.Module):
    """Global attention module (reference GAM): MLP channel gate +
    conv spatial gate."""
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        hidden = max(c // self.reduction, 1)
        g = nn.Dense(hidden, name="fc1")(x)
        g = nn.relu(g)
        g = nn.Dense(c, name="fc2")(g)
        x = x * jax.nn.sigmoid(g)
        s = nn.Conv(hidden, (7, 7), padding="SAME", name="conv1")(x)
        s = nn.relu(s)
        s = nn.Conv(c, (7, 7), padding="SAME", name="conv2")(s)
        return x * jax.nn.sigmoid(s)


class SKFF(nn.Module):
    """Selective kernel feature fusion (reference SKFF): softmax-weighted
    fusion of multi-branch features. Call with a LIST of same-shape maps."""
    reduction: int = 8

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> jax.Array:
        n = len(feats)
        c = feats[0].shape[-1]
        hidden = max(c // self.reduction, 4)
        u = sum(feats)
        s = jnp.mean(u, axis=(1, 2))
        z = nn.relu(nn.Dense(hidden, name="fc")(s))
        logits = [nn.Dense(c, name=f"sel{i}")(z) for i in range(n)]
        w = jax.nn.softmax(jnp.stack(logits, axis=1), axis=1)  # [B, n, C]
        out = sum(feats[i] * w[:, i][:, None, None, :] for i in range(n))
        return out


from .attention_extra import (ACmix, DAttention, HaloAttention,  # noqa: E402
                              MobileViTAttention, OutlookAttention)
from .attention_more import (BAM, SGE, CoTAttention,  # noqa: E402
                             ExternalAttention, ParNetAttention,
                             PolarizedSelfAttention, S2Attention,
                             SKAttention, TripletAttention)
from .attention_seq import (EMSA, AFTFull, DAModule,  # noqa: E402
                            DoubleAttention, MobileViTv2Attention,
                            MUSEAttention, ScaledDotProductAttention,
                            SimplifiedSelfAttention, UFOAttention)
from .attention_spatial import (AxialAttention, CABlock,  # noqa: E402
                                CoAtNetBlock, CrissCrossAttention,
                                CrossformerAttention, GFNetBlock,
                                MOAGlobalAttention, MultiSpectralAttention,
                                PyramidSplitAttention, ResidualAttention,
                                SequentialPolarizedSelfAttention,
                                ViPAttention)

ATTENTION = {
    "se": SELayer,
    "eca": ECALayer,
    "sa": SALayer,
    "cbam": CBAM,
    "coordatt": CoordAtt,
    "simam": SimAM,
    "shuffle": ShuffleAttention,
    "gam": GAM,
    "skff": SKFF,
    "halo": HaloAttention,
    "outlook": OutlookAttention,
    "mobilevit": MobileViTAttention,
    "acmix": ACmix,
    "dat": DAttention,
    "bam": BAM,
    "triplet": TripletAttention,
    "sk": SKAttention,
    "external": ExternalAttention,
    "psa": PolarizedSelfAttention,
    "sge": SGE,
    "cot": CoTAttention,
    "parnet": ParNetAttention,
    "s2": S2Attention,
    # token-style zoo (attention_seq.py)
    "self": ScaledDotProductAttention,
    "simself": SimplifiedSelfAttention,
    "ufo": UFOAttention,
    "muse": MUSEAttention,
    "aft": AFTFull,
    "mobilevitv2": MobileViTv2Attention,
    "emsa": EMSA,
    "danet": DAModule,
    "a2": DoubleAttention,
    # spatially-structured zoo (attention_spatial.py)
    "crisscross": CrissCrossAttention,
    "axial": AxialAttention,
    "crossformer": CrossformerAttention,
    "moa": MOAGlobalAttention,
    "gfnet": GFNetBlock,
    "vip": ViPAttention,
    "epsa": PyramidSplitAttention,
    "psa_seq": SequentialPolarizedSelfAttention,
    "coatnet": CoAtNetBlock,
    "ca_block": CABlock,
    "fca": MultiSpectralAttention,
    "residual": ResidualAttention,  # NOT shape-preserving (see class doc)
}


def build_attention(name: str | None, **kwargs):
    """Factory: name -> module instance (None/'none' -> None)."""
    if name in (None, "none", False):
        return None
    if name not in ATTENTION:
        raise KeyError(f"Unknown attention '{name}'. Available: "
                       f"{sorted(ATTENTION)}")
    return ATTENTION[name](**kwargs)
