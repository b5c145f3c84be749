"""Mobile backbone family: CSPMobileNext, ECMNet, MobileNetV3 S/L.

Capability parity with reference models/backbones/mobilenext_csp.py:15-173,
ecmnet.py:15-177, mobilenetv3.py:15-220. Shared building block is the
MobileNeXt 'sandglass' bottleneck (dw3x3 -> pw-expand -> pw-reduce -> dw3x3
with the reference's sparse-activation placement: act only on the pw-expand,
final act after the residual add). NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import ConvBlock, Focus, SPPBottleneck, get_activation


class SandglassBlock(nn.Module):
    """MobileNeXt sandglass bottleneck (mobilenext_csp.py Bottleneck,
    :135-173): dw3x3(bn) -> 1x1 expand(act) -> 1x1 reduce(bn) -> dw3x3(bn),
    residual, then activation."""

    out_channels: int
    expansion: float = 2.0
    shortcut: bool = True
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        hidden = int(self.out_channels * self.expansion)
        y = ConvBlock(in_ch, ksize=3, groups=in_ch, norm=self.norm, act=None,
                      name="conv0")(x, train)
        y = ConvBlock(hidden, ksize=1, norm=None, act=self.act,
                      name="conv1")(y, train)
        y = ConvBlock(self.out_channels, ksize=1, norm=self.norm, act=None,
                      name="conv2")(y, train)
        y = ConvBlock(self.out_channels, ksize=3, groups=self.out_channels,
                      norm=self.norm, act=None, name="conv3")(y, train)
        if self.shortcut and in_ch == self.out_channels:
            y = y + x
        return get_activation(self.act)(y)


class MobileCSPLayer(nn.Module):
    """2-branch CSP of sandglass bottlenecks, concat + act, no fuse conv
    (mobilenext_csp.py CSPLayer, :89-133)."""

    num_bottle: int = 1
    shortcut: bool = True
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = x.shape[-1] // 2
        kw = dict(norm=self.norm, act=self.act)
        x1 = ConvBlock(half, ksize=1, name="conv1", **kw)(x, train)
        x2 = ConvBlock(half, ksize=1, name="conv2", **kw)(x, train)
        for i in range(max(self.num_bottle - 1, 0)):
            x1 = SandglassBlock(half, expansion=2.0, shortcut=self.shortcut,
                                norm=self.norm, act=self.act,
                                name=f"m{i}")(x1, train)
        out = jnp.concatenate([x2, x1], axis=-1)
        return get_activation(self.act)(out)


class ELANSandglassLayer(nn.Module):
    """4-branch ELAN-style aggregation of sandglass stacks
    (ecmnet.py CSPLayer, :90-139): quarter-width branches, concat to in_ch."""

    num_bottle: int = 1
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        quarter = x.shape[-1] // 4
        num_conv = self.num_bottle // 2 if self.num_bottle > 2 else 1
        kw = dict(norm=self.norm, act=self.act)
        x1 = ConvBlock(quarter, ksize=1, name="conv1", **kw)(x, train)
        x2 = ConvBlock(quarter, ksize=1, name="conv2", **kw)(x, train)
        x3 = x2
        for i in range(num_conv):
            x3 = SandglassBlock(quarter, expansion=2.0, norm=self.norm,
                                act=self.act, name=f"conv3_{i}")(x3, train)
        x4 = x3
        for i in range(num_conv):
            x4 = SandglassBlock(quarter, expansion=2.0, norm=self.norm,
                                act=self.act, name=f"conv4_{i}")(x4, train)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)


class _StagedBackbone(nn.Module):
    """Focus stem + 4 (stride-2 conv + block) stages, SPP in stage4 —
    the shared skeleton of CSPMobileNext / ECMNet."""

    # Focus stem => trainer may feed pre-s2d input (see cspdarknet.py)
    STEM_S2D = True

    depths: Sequence[int] = (3, 9, 9, 3)
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")
    norm: str = "bn"
    act: str = "silu"

    def make_block(self, depth: int, last: bool, name: str):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        kw = dict(norm=self.norm, act=self.act)
        feats = {}
        x = Focus(self.channels[0], ksize=3, name="stem", **kw)(x, train)
        feats["stem"] = x
        for i in range(4):
            ch = self.channels[i + 1]
            x = ConvBlock(ch, ksize=3, stride=2, name=f"stage{i+1}_down",
                          **kw)(x, train)
            if i == 3:
                x = SPPBottleneck(ch, name="stage4_spp", **kw)(x, train)
            x = self.make_block(self.depths[i], last=(i == 3),
                                name=f"stage{i+1}_block")(x, train)
            feats[f"stage{i+1}"] = x
        return [feats[k] for k in self.outputs]


class CSPMobileNext(_StagedBackbone):
    def make_block(self, depth, last, name):
        return MobileCSPLayer(num_bottle=depth, shortcut=not last,
                              norm=self.norm, act=self.act, name=name)


class ECMNet(_StagedBackbone):
    def make_block(self, depth, last, name):
        return ELANSandglassLayer(num_bottle=depth, norm=self.norm,
                                  act=self.act, name=name)


# ------------------------------------------------------------- MobileNetV3

class SEModule(nn.Module):
    """Squeeze-excite with hard-sigmoid gate (mobilenetv3.py SeModule)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = ConvBlock(ch // self.reduction, ksize=1, norm="bn", act="relu",
                      name="fc1")(s, train)
        s = ConvBlock(ch, ksize=1, norm="bn", act="hsigmoid",
                      name="fc2")(s, train)
        return x * s


class MNV3Block(nn.Module):
    """MobileNetV3 inverted residual (mobilenetv3.py Block): 1x1 expand ->
    dw kxk -> optional SE -> 1x1 project, residual when stride 1 & ch match."""

    ksize: int
    expand: int
    out_channels: int
    act: str
    use_se: bool
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        y = ConvBlock(self.expand, ksize=1, norm="bn", act=self.act,
                      name="expand")(x, train)
        y = ConvBlock(self.expand, ksize=self.ksize, stride=self.stride,
                      groups=self.expand, norm="bn", act=self.act,
                      name="dw")(y, train)
        if self.use_se:
            y = SEModule(name="se")(y, train)
        y = ConvBlock(self.out_channels, ksize=1, norm="bn", act=None,
                      name="project")(y, train)
        if self.stride == 1 and in_ch == self.out_channels:
            y = y + x
        return y


# (ksize, in, expand, out, act, se, stride) — mobilenetv3.py:30-52 (small)
# and :99-125 (large)
_MNV3_SMALL = (
    ((3, 16, 16, 16, "relu", True, 2),),
    ((3, 16, 72, 24, "relu", False, 2), (3, 24, 88, 24, "relu", False, 1)),
    ((5, 24, 96, 40, "hswish", True, 2), (5, 40, 240, 40, "hswish", True, 1),
     (5, 40, 240, 40, "hswish", True, 1), (5, 40, 120, 48, "hswish", True, 1),
     (5, 48, 144, 48, "hswish", True, 1)),
    ((5, 48, 288, 96, "hswish", True, 2), (5, 96, 576, 96, "hswish", True, 1),
     (5, 96, 576, 96, "hswish", True, 1)),
)
_MNV3_LARGE = (
    ((3, 16, 16, 16, "relu", False, 1), (3, 16, 64, 24, "relu", False, 2),
     (3, 24, 72, 24, "relu", False, 1)),
    ((5, 24, 72, 40, "relu", True, 2), (5, 40, 120, 40, "relu", True, 1),
     (5, 40, 120, 40, "relu", True, 1)),
    ((3, 40, 240, 80, "hswish", False, 2), (3, 80, 200, 80, "hswish", False, 1),
     (3, 80, 184, 80, "hswish", False, 1), (3, 80, 184, 80, "hswish", False, 1)),
    ((3, 80, 480, 112, "hswish", True, 1), (3, 112, 672, 112, "hswish", True, 1),
     (5, 112, 672, 160, "hswish", True, 1), (5, 160, 672, 160, "hswish", True, 2),
     (5, 160, 960, 160, "hswish", True, 1)),
)


class MobileNetV3(nn.Module):
    """MobileNetV3 S/L multi-scale backbone (mobilenetv3.py:15-141).
    NOTE: the small variant's stage strides put stage2/3/4 at 8/16/32 via
    its own table; out channels small=(24,48,96), large=(40,80,160)."""

    size: str = "small"
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        table = _MNV3_SMALL if self.size == "small" else _MNV3_LARGE
        feats = {}
        x = ConvBlock(16, ksize=3, stride=2, norm="bn", act="hswish",
                      name="stem")(x, train)
        feats["stem"] = x
        for si, stage in enumerate(table):
            for bi, (k, _in, exp, out, act, se, s) in enumerate(stage):
                x = MNV3Block(ksize=k, expand=exp, out_channels=out, act=act,
                              use_se=se, stride=s,
                              name=f"stage{si+1}_b{bi}")(x, train)
            feats[f"stage{si+1}"] = x
        return [feats[k] for k in self.outputs]
