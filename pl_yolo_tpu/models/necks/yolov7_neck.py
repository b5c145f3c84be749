"""YOLOv7 neck: SPPCSPC entry, ELAN-style CSP blocks, Transition downsamples,
3x3 output convs (optionally RepConv).

Capability parity with reference models/necks/yolov7_neck.py:7-355. The
reference defines RepConv with deploy-time branch fusion
(get_equivalent_kernel_bias :213-220); here RepConv is a flax module whose
3 branches (3x3+BN, 1x1+BN, identity BN) fuse into a single conv at export
via `pl_yolo_tpu.utils.fuse.fuse_repconv`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import (
    ConvBlock, SPPCSPC, get_activation, upsample_nearest_2x, BN_EPS, BN_MOMENTUM,
)
from ..backbones.eelan import max_pool_stride2


class V7CSPLayer(nn.Module):
    """ELAN-style aggregation used in the v7 neck (yolov7_neck.py:105-147):
    branches [1x1(x), 1x1(x), 1x1 of that, then num_bottle chained 3x3s, all
    concatenated] -> 1x1 fuse."""

    out_channels: int
    num_bottle: int = 1
    expansion: float = 0.5
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(x.shape[-1] * self.expansion)
        kw = dict(norm=self.norm, act=self.act)
        x1 = ConvBlock(hidden, ksize=1, name="conv1", **kw)(x, train)
        x2 = ConvBlock(hidden, ksize=1, name="conv2", **kw)(x, train)
        x3 = ConvBlock(hidden // 2, ksize=1, name="conv3", **kw)(x2, train)
        parts = [x1, x2, x3]
        for i in range(self.num_bottle):
            x3 = ConvBlock(hidden // 2, ksize=3, name=f"conv4_{i}", **kw)(x3, train)
            parts.append(x3)
        x = jnp.concatenate(parts, axis=-1)
        return ConvBlock(self.out_channels, ksize=1, name="conv5", **kw)(x, train)


class V7Transition(nn.Module):
    """MaxPool+1x1 || 1x1+3x3s2 with explicit out channels
    (yolov7_neck.py:149-165)."""

    out_channels: int
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.out_channels // 2
        kw = dict(norm=self.norm, act=self.act)
        x1 = max_pool_stride2(x)
        x1 = ConvBlock(half, ksize=1, name="conv1", **kw)(x1, train)
        x2 = ConvBlock(half, ksize=1, name="conv2", **kw)(x, train)
        x2 = ConvBlock(half, ksize=3, stride=2, name="conv3", **kw)(x2, train)
        return jnp.concatenate([x2, x1], axis=-1)


class RepConv(nn.Module):
    """RepVGG-style re-parameterizable 3x3 conv (yolov7_neck.py:167-349):
    train-time 3x3+BN, 1x1+BN and (when shapes allow) identity-BN branches
    summed before activation; export-time fusion collapses them into one
    3x3 conv (utils/fuse.py)."""

    out_channels: int
    stride: int = 1
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       name=name)
        dense = nn.Conv(self.out_channels, (3, 3), strides=self.stride,
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name="rbr_dense_conv")(x)
        dense = bn("rbr_dense_bn")(dense)
        one = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                      use_bias=False, name="rbr_1x1_conv")(x)
        one = bn("rbr_1x1_bn")(one)
        out = dense + one
        if in_ch == self.out_channels and self.stride == 1:
            out = out + bn("rbr_identity")(x)
        return get_activation(self.act)(out)


class YOLOv7NECK(nn.Module):
    """3-in/3-out PAFPN with SPPCSPC entry (yolov7_neck.py:7-102)."""

    depths: Sequence[int] = (1, 1, 1, 1)
    in_channels: Sequence[int] = (512, 1024, 1024)
    use_repconv: bool = False   # reference forward uses BaseConv (:68-70)
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        c3, c4, c5 = inputs
        base = self.in_channels[2]
        kw = dict(norm=self.norm, act=self.act)
        d = self.depths[0]

        p5 = SPPCSPC(base // 2, name="spp", **kw)(c5, train)
        p5_shrink = ConvBlock(base // 4, ksize=1, name="conv_for_P5", **kw)(p5, train)
        c4p = ConvBlock(base // 4, ksize=1, name="conv_for_C4", **kw)(c4, train)
        p4 = jnp.concatenate([upsample_nearest_2x(p5_shrink), c4p], axis=-1)
        p4 = V7CSPLayer(base // 4, num_bottle=d, name="p5_p4", **kw)(p4, train)

        p4_shrink = ConvBlock(base // 8, ksize=1, name="conv_for_P4", **kw)(p4, train)
        c3p = ConvBlock(base // 8, ksize=1, name="conv_for_C3", **kw)(c3, train)
        p3 = jnp.concatenate([upsample_nearest_2x(p4_shrink), c3p], axis=-1)
        p3 = V7CSPLayer(base // 8, num_bottle=d, name="p4_p3", **kw)(p3, train)

        n3 = p3
        n3_down = V7Transition(base // 4, name="downsample_conv1", **kw)(n3, train)
        n4 = jnp.concatenate([n3_down, p4], axis=-1)
        n4 = V7CSPLayer(base // 4, num_bottle=d, name="n3_n4", **kw)(n4, train)

        n4_down = V7Transition(base // 2, name="downsample_conv2", **kw)(n4, train)
        n5 = jnp.concatenate([n4_down, p5], axis=-1)
        n5 = V7CSPLayer(base // 2, num_bottle=d, name="n4_n5", **kw)(n5, train)

        out_conv = (RepConv if self.use_repconv else
                    lambda ch, name: ConvBlock(ch, ksize=3, name=name, **kw))
        if self.use_repconv:
            n3 = RepConv(base // 4, act=self.act, name="n3_out")(n3, train)
            n4 = RepConv(base // 2, act=self.act, name="n4_out")(n4, train)
            n5 = RepConv(base, act=self.act, name="n5_out")(n5, train)
        else:
            n3 = ConvBlock(base // 4, ksize=3, name="n3_out", **kw)(n3, train)
            n4 = ConvBlock(base // 2, ksize=3, name="n4_out", **kw)(n4, train)
            n5 = ConvBlock(base, ksize=3, name="n5_out", **kw)(n5, train)
        return (n3, n4, n5)
