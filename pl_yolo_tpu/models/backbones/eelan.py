"""E-ELAN backbone (YOLOv7).

Capability parity with reference models/backbones/eelan.py:15-141:
3-conv stem (3->32->c0 stride2->c0), then 4 stages; stage1 is a stride-2
conv + ELAN block, stages 2-4 use a MaxPool+conv Transition downsample
(eelan.py:126-141) + ELAN block; SPP before the ELAN in stage4. The ELAN
block (reference's 4-branch 'CSPLayer', eelan.py:82-123) concatenates
[1x1(x), 1x1(x), convs(...), convs(convs(...))]. NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import ConvBlock, SPPBottleneck


class ELANBlock(nn.Module):
    """4-branch ELAN aggregation (reference eelan.py CSPLayer, :82-123):
    two 1x1 projections; two stacks of `num_conv` 3x3 convs chained off the
    second; concat all four -> 1x1 fuse. num_conv = num_bottle//2 (min 1)."""

    out_channels: int
    num_bottle: int = 1
    expansion: float = 0.5
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = int(in_ch * self.expansion)
        num_conv = self.num_bottle // 2 if self.num_bottle > 2 else 1
        kw = dict(norm=self.norm, act=self.act)
        x1 = ConvBlock(hidden, ksize=1, name="conv1", **kw)(x, train)
        x2 = ConvBlock(hidden, ksize=1, name="conv2", **kw)(x, train)
        x3 = x2
        for i in range(num_conv):
            x3 = ConvBlock(hidden, ksize=3, name=f"conv3_{i}", **kw)(x3, train)
        x4 = x3
        for i in range(num_conv):
            x4 = ConvBlock(hidden, ksize=3, name=f"conv4_{i}", **kw)(x4, train)
        out = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        return ConvBlock(self.out_channels, ksize=1, name="conv5", **kw)(out, train)


def max_pool_stride2(x: jax.Array, k: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, k, k, 1),
        padding="VALID")


class Transition(nn.Module):
    """MaxPool+1x1 || 1x1+3x3s2 downsample (reference eelan.py:126-141).
    Output channels == input channels (two half-width branches concat)."""

    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = x.shape[-1] // 2
        kw = dict(norm=self.norm, act=self.act)
        x1 = max_pool_stride2(x)
        x1 = ConvBlock(half, ksize=1, name="conv1", **kw)(x1, train)
        x2 = ConvBlock(half, ksize=1, name="conv2", **kw)(x, train)
        x2 = ConvBlock(half, ksize=3, stride=2, name="conv3", **kw)(x2, train)
        return jnp.concatenate([x2, x1], axis=-1)


class EELAN(nn.Module):
    depths: Sequence[int] = (4, 4, 4, 4)
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        kw = dict(norm=self.norm, act=self.act)
        ch = self.channels
        feats = {}
        x = ConvBlock(32, ksize=3, stride=1, name="stem0", **kw)(x, train)
        x = ConvBlock(ch[0], ksize=3, stride=2, name="stem1", **kw)(x, train)
        x = ConvBlock(ch[0], ksize=3, stride=1, name="stem2", **kw)(x, train)
        feats["stem"] = x

        x = ConvBlock(ch[1], ksize=3, stride=2, name="stage1_down", **kw)(x, train)
        x = ELANBlock(ch[2], num_bottle=self.depths[0], name="stage1_elan", **kw)(x, train)
        feats["stage1"] = x

        x = Transition(name="stage2_trans", **kw)(x, train)
        x = ELANBlock(ch[3], num_bottle=self.depths[1], name="stage2_elan", **kw)(x, train)
        feats["stage2"] = x

        x = Transition(name="stage3_trans", **kw)(x, train)
        x = ELANBlock(ch[4], num_bottle=self.depths[2], name="stage3_elan", **kw)(x, train)
        feats["stage3"] = x

        x = Transition(name="stage4_trans", **kw)(x, train)
        x = SPPBottleneck(ch[4], name="stage4_spp", **kw)(x, train)
        x = ELANBlock(ch[4], num_bottle=self.depths[3], name="stage4_elan", **kw)(x, train)
        feats["stage4"] = x
        return [feats[k] for k in self.outputs]
