"""Heavy attention plug-ins: Halo, Outlook, MobileViT, ACmix, deformable
(DAT) — TPU-native NHWC flax ports of the reference zoo's named heavy
hitters (VERDICT r1 #10; reference models/layers/attention/{HaloAttention,
OutlookAttention,MobileViTAttention,ACmixAttention,DAT}.py).

Design stance: window/patch extraction uses lax.conv_general_dilated_patches
(dense, MXU/VPU-friendly) instead of torch unfold; deliberate deviations are
noted per class. All modules preserve [B, H, W, C] and take no required
constructor args (the plug-in registry contract)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _extract_patches(x: jax.Array, k: int, stride: int = 1,
                     padding=0) -> jax.Array:
    """NHWC sliding windows: [B,H,W,C] -> [B, Ho, Wo, k*k, C].

    lax.conv_general_dilated_patches returns channels as C*k*k with the
    spatial offsets fastest-varying per channel; reshape accordingly."""
    b, h, w, c = x.shape
    pad = ([(padding, padding)] * 2 if isinstance(padding, int) else padding)
    out = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(k, k), window_strides=(stride, stride),
        padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ho, wo = out.shape[1:3]
    return out.reshape(b, ho, wo, c, k * k).transpose(0, 1, 2, 4, 3)


class HaloAttention(nn.Module):
    """Blocked local self-attention with halo keys (HaloNet;
    HaloAttention.py:74-160). Queries come from non-overlapping
    block x block windows, keys/values from the (block+2*halo)^2 haloed
    windows. Deviation: the query-dependent lambda-style relative embedding
    (RelPosEmb, :46-71) is replaced by a Swin-style static relative-position
    bias table — same receptive structure, one table lookup."""

    block: int = 4
    halo: int = 1
    heads: int = 4
    dim_head: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        blk, halo, heads = self.block, self.halo, self.heads
        assert h % blk == 0 and w % blk == 0, "H,W must divide block"
        inner = heads * self.dim_head
        bh = blk + 2 * halo
        nh, nw = h // blk, w // blk
        nq, nk = blk * blk, bh * bh

        q_in = x.reshape(b, nh, blk, nw, blk, c).transpose(0, 1, 3, 2, 4, 5)
        q_in = q_in.reshape(b, nh * nw, nq, c)
        kv_in = _extract_patches(x, bh, stride=blk, padding=halo)
        kv_in = kv_in.reshape(b, nh * nw, nk, c)

        q = nn.Dense(inner, use_bias=False, name="to_q")(q_in)
        k = nn.Dense(inner, use_bias=False, name="to_k")(kv_in)
        v = nn.Dense(inner, use_bias=False, name="to_v")(kv_in)

        def split(t, n):
            return t.reshape(b, nh * nw, n, heads, self.dim_head
                             ).transpose(0, 1, 3, 2, 4)

        q, k, v = split(q, nq), split(k, nk), split(v, nk)
        sim = jnp.einsum("bwhid,bwhjd->bwhij", q, k) * self.dim_head ** -0.5

        # static relative-position bias: offsets between query cells (at
        # +halo) and halo-window cells span [-(bh-1), blk+halo-1]
        span = 2 * bh - 1
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           (heads, span, span))
        qy, qx = np.meshgrid(np.arange(blk) + halo, np.arange(blk) + halo,
                             indexing="ij")
        ky, kx = np.meshgrid(np.arange(bh), np.arange(bh), indexing="ij")
        dy = (qy.reshape(-1, 1) - ky.reshape(1, -1)) + bh - 1   # [nq, nk]
        dx = (qx.reshape(-1, 1) - kx.reshape(1, -1)) + bh - 1
        sim = sim + table[:, dy, dx][None, None]

        # mask keys that fall in the zero padding outside the image (static)
        ones = jnp.ones((1, h, w, 1), sim.dtype)
        kmask = _extract_patches(ones, bh, stride=blk, padding=halo)
        kmask = kmask.reshape(1, nh * nw, 1, 1, nk) > 0
        sim = jnp.where(kmask, sim, jnp.finfo(sim.dtype).min)

        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bwhij,bwhjd->bwhid", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, nh * nw, nq, inner)
        out = nn.Dense(c, name="to_out")(out)
        out = out.reshape(b, nh, nw, blk, blk, c).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, h, w, c)


class OutlookAttention(nn.Module):
    """Outlook attention (VOLO; OutlookAttention.py:8-54), stride-1 path:
    each position predicts a k^2 x k^2 attention over its local window from
    its own features; outputs are overlap-added (the fold) as k^2 shifted
    accumulations — dense adds instead of torch F.fold."""

    kernel: int = 3
    heads: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        k, heads = self.kernel, self.heads
        hd = c // heads
        kk = k * k
        pad = k // 2

        v = nn.Dense(c, use_bias=False, name="v")(x)
        v_pat = _extract_patches(v, k, padding=pad)          # [B,H,W,kk,C]
        v_pat = v_pat.reshape(b, h, w, kk, heads, hd)

        attn = nn.Dense(kk * kk * heads, name="attn")(x)
        attn = attn.reshape(b, h, w, heads, kk, kk) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.einsum("bhwgij,bhwjgd->bhwigd", attn, v_pat)
        out = out.reshape(b, h, w, kk, c)

        # fold: out[i,j,t] contributes to pixel (i + t_y - pad, j + t_x - pad)
        folded = jnp.zeros((b, h + 2 * pad, w + 2 * pad, c), out.dtype)
        for t in range(kk):
            ty, tx = t // k, t % k
            folded = jax.lax.dynamic_update_slice(
                folded,
                jax.lax.dynamic_slice(
                    folded, (0, ty, tx, 0), (b, h, w, c)) + out[:, :, :, t],
                (0, ty, tx, 0))
        folded = folded[:, pad:pad + h, pad:pad + w]
        return nn.Dense(c, name="proj")(folded)


class MLP(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.silu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(d, name="fc2")(x)


class MobileViTAttention(nn.Module):
    """MobileViT block (MobileViTAttention.py:76-105): local 3x3+1x1 convs,
    transformer over cross-patch tokens (token t = pixel offset t across the
    patch grid), 1x1 back, concat with input, 3x3 fuse."""

    dim: int = 64
    patch: int = 2
    depth: int = 2
    heads: int = 4
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        p = self.patch
        assert h % p == 0 and w % p == 0, "H,W must divide patch"
        y = nn.Conv(c, (3, 3), padding=1, name="conv1")(x)
        y = nn.Conv(self.dim, (1, 1), name="conv2")(y)

        nh, nw = h // p, w // p
        y = y.reshape(b, nh, p, nw, p, self.dim).transpose(0, 2, 4, 1, 3, 5)
        y = y.reshape(b, p * p, nh * nw, self.dim)
        for i in range(self.depth):
            z = nn.LayerNorm(name=f"ln_a{i}")(y)
            y = y + nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn{i}")(z, z)
            y = y + MLP(int(self.dim * self.mlp_ratio), name=f"mlp{i}")(
                nn.LayerNorm(name=f"ln_m{i}")(y))
        y = y.reshape(b, p, p, nh, nw, self.dim).transpose(0, 3, 1, 4, 2, 5)
        y = y.reshape(b, h, w, self.dim)

        y = nn.Conv(c, (1, 1), name="conv3")(y)
        y = jnp.concatenate([x, y], axis=-1)
        return nn.Conv(c, (3, 3), padding=1, name="conv4")(y)


class ACmix(nn.Module):
    """ACmix (ACmixAttention.py:29-102): shared 1x1 q/k/v projections feed
    BOTH a local-window self-attention path (kernel_att, with a learned
    positional map) and a shift-conv path (k^2 feature maps depthwise-mixed,
    init'd to identity shifts), combined with learned rates (init 0.5)."""

    kernel_att: int = 7
    kernel_conv: int = 3
    heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        heads = self.heads
        hd = c // heads
        ka = self.kernel_att
        kk = self.kernel_conv ** 2
        pad = ka // 2

        q = nn.Conv(c, (1, 1), name="conv1")(x)
        k = nn.Conv(c, (1, 1), name="conv2")(x)
        v = nn.Conv(c, (1, 1), name="conv3")(x)

        # learned positional encoding from normalized coordinates
        loc = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, w),
                                     jnp.linspace(-1, 1, h)), axis=-1)
        pe = nn.Conv(hd, (1, 1), name="conv_p")(loc[None].astype(x.dtype))

        def win(t):  # reflection-padded local windows
            tp = jnp.pad(t, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                         mode="reflect")
            return _extract_patches(tp, ka)

        k_win = win(k).reshape(b, h, w, ka * ka, heads, hd)
        v_win = win(v).reshape(b, h, w, ka * ka, heads, hd)
        pe_win = win(pe).reshape(1, h, w, ka * ka, 1, hd)

        qh = q.reshape(b, h, w, heads, hd) * hd ** -0.5
        att = jnp.einsum("bhwgd,bhwjgd->bhwgj",
                         qh, k_win + pe[:, :, :, None, None] - pe_win)
        att = jax.nn.softmax(att, axis=-1)
        out_att = jnp.einsum("bhwgj,bhwjgd->bhwgd", att, v_win)
        out_att = out_att.reshape(b, h, w, c)

        # conv path: per-position mix of q/k/v head maps -> k^2 shift maps
        f_all = jnp.concatenate([
            q.reshape(b, h, w, heads, hd), k.reshape(b, h, w, heads, hd),
            v.reshape(b, h, w, heads, hd)], axis=3)       # [B,H,W,3*heads,hd]
        f_mix = nn.DenseGeneral(kk, axis=3, use_bias=False, name="fc")(
            f_all.transpose(0, 1, 2, 4, 3)).transpose(0, 1, 2, 4, 3)
        # shift-add (dep_conv identity-shift init): map t shifts by its
        # kernel offset, then a pointwise mix back to C channels
        kc = self.kernel_conv
        cp = kc // 2
        fp = jnp.pad(f_mix, [(0, 0), (cp, cp), (cp, cp), (0, 0), (0, 0)])
        acc = jnp.zeros((b, h, w, hd), x.dtype)
        for t in range(kk):
            dy, dx = t // kc - cp, t % kc - cp
            acc = acc + jax.lax.dynamic_slice(
                fp, (0, cp + dy, cp + dx, t, 0), (b, h, w, 1, hd))[:, :, :, 0]
        out_conv = nn.Dense(c, name="dep_mix")(acc)

        rate1 = self.param("rate1", nn.initializers.constant(0.5), (1,))
        rate2 = self.param("rate2", nn.initializers.constant(0.5), (1,))
        return rate1 * out_att + rate2 * out_conv


class DAttention(nn.Module):
    """Deformable attention (DAT; DAT.py:129-296): a grouped depthwise
    offset network predicts sample locations; k/v are bilinearly sampled at
    the deformed grid and attended by all queries. Deviations: positional
    bias off by default (the reference's rel-table grid_sample), offsets at
    full resolution (stride 1)."""

    heads: int = 4
    groups: int = 2
    offset_ks: int = 5
    offset_range: float = 2.0
    downsample: int = 2   # sampled grid is (H/ds, W/ds)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        g = self.groups
        gc = c // g
        hd = c // self.heads
        ds = self.downsample
        hk, wk = max(h // ds, 1), max(w // ds, 1)

        q = nn.Conv(c, (1, 1), name="proj_q")(x)

        q_off = q.reshape(b, h, w, g, gc).transpose(0, 3, 1, 2, 4)
        q_off = q_off.reshape(b * g, h, w, gc)
        o = nn.Conv(gc, (self.offset_ks, self.offset_ks), strides=(ds, ds),
                    feature_group_count=gc, name="off_dw")(q_off)
        o = nn.gelu(nn.LayerNorm(name="off_ln")(o))
        off = nn.Conv(2, (1, 1), use_bias=False, name="off_pw")(o)
        off = jnp.tanh(off) * (self.offset_range / jnp.asarray([hk, wk]))

        ry = (jnp.arange(hk) + 0.5) / hk * 2 - 1
        rx = (jnp.arange(wk) + 0.5) / wk * 2 - 1
        ref = jnp.stack(jnp.meshgrid(ry, rx, indexing="ij"), -1)  # [hk,wk,2]
        pos = ref[None] + off                                # [B*g,hk,wk,2]

        # bilinear sample x at pos (normalized [-1,1], align_corners=True)
        xg = x.reshape(b, h, w, g, gc).transpose(0, 3, 1, 2, 4)
        xg = xg.reshape(b * g, h, w, gc)
        py = (pos[..., 0] + 1) * 0.5 * (h - 1)
        px = (pos[..., 1] + 1) * 0.5 * (w - 1)

        def sample_one(img, yy, xx):
            from ..data.augment import bilinear_sample
            return bilinear_sample(img, xx, yy, fill=0.0)

        sampled = jax.vmap(sample_one)(xg, py, px)           # [B*g,hk,wk,gc]
        sampled = sampled.reshape(b, g, hk * wk, gc).transpose(0, 2, 1, 3)
        sampled = sampled.reshape(b, hk * wk, c)

        kv = sampled
        kt = nn.Dense(c, name="proj_k")(kv).reshape(b, -1, self.heads, hd)
        vt = nn.Dense(c, name="proj_v")(kv).reshape(b, -1, self.heads, hd)
        qt = q.reshape(b, h * w, self.heads, hd) * hd ** -0.5
        att = jnp.einsum("bmhd,bnhd->bhmn", qt, kt)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhmn,bnhd->bmhd", att, vt).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), name="proj_out")(out)
