"""Extra backbones: EfficientRep, ResNet, ConvNeXt, GhostNet, VGG, MobileNeXt.

Capability parity with the reference's unwired extras
(models/backbones/efficientrep.py:1-305 RepVGG blocks + SimSPPF,
resnet.py:15-132, convnext.py:18-191, ghostnet.py:15-261, vgg.py:13-44,
mobilenext.py:15-236 — all "present but not wired into build_detection.py",
SURVEY.md §2.3). Here they ARE registered, fixing the dead code.

All are NHWC multi-scale detection backbones returning (stage2, stage3,
stage4) at strides 8/16/32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import ConvBlock, max_pool_same, get_activation
from ..necks.yolov7_neck import RepConv
from .mobile import SandglassBlock


# ----------------------------------------------------------- EfficientRep

class SimSPPF(nn.Module):
    """Sequential SPP with ReLU (efficientrep.py:171-186): three chained
    5x5 stride-1 max pools, concat, fuse."""

    out_channels: int
    ksize: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        kw = dict(norm="bn", act="relu")
        x = ConvBlock(hidden, ksize=1, name="cv1", **kw)(x, train)
        y1 = max_pool_same(x, self.ksize)
        y2 = max_pool_same(y1, self.ksize)
        y3 = max_pool_same(y2, self.ksize)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBlock(self.out_channels, ksize=1, name="cv2", **kw)(out, train)


class EfficientRep(nn.Module):
    """RepVGG-block backbone (efficientrep.py:199-305): rep stem + 4 stages
    of (rep stride-2 + n rep blocks); SimSPPF at the end of stage4."""

    depths: Sequence[int] = (1, 2, 3, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        x = RepConv(self.channels[0], stride=2, act="relu", name="stem")(x, train)
        feats["stem"] = x
        for i in range(4):
            ch = self.channels[i + 1]
            x = RepConv(ch, stride=2, act="relu", name=f"stage{i+1}_down")(x, train)
            for j in range(self.depths[i]):
                x = RepConv(ch, act="relu", name=f"stage{i+1}_rep{j}")(x, train)
            if i == 3:
                x = SimSPPF(ch, name="stage4_sppf")(x, train)
            feats[f"stage{i+1}"] = x
        return [feats[k] for k in self.outputs]


# ----------------------------------------------------------------- ResNet

class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = ConvBlock(self.out_channels, ksize=3, stride=self.stride,
                      norm="bn", act="relu", name="conv1")(x, train)
        y = ConvBlock(self.out_channels, ksize=3, norm="bn", act=None,
                      name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            identity = ConvBlock(self.out_channels, ksize=1,
                                 stride=self.stride, norm="bn", act=None,
                                 name="down")(x, train)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-18/34 style det backbone (resnet.py:15-132): 7x7 s2 stem +
    maxpool, 4 basic-block stages."""

    depths: Sequence[int] = (2, 2, 2, 2)
    channels: Sequence[int] = (64, 128, 256, 512)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        x = ConvBlock(self.channels[0], ksize=7, stride=2, norm="bn",
                      act="relu", name="stem")(x, train)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        feats["stem"] = x
        for i in range(4):
            stride = 1 if i == 0 else 2
            for j in range(self.depths[i]):
                x = BasicBlock(self.channels[i],
                               stride=stride if j == 0 else 1,
                               name=f"stage{i+1}_b{j}")(x, train)
            feats[f"stage{i+1}"] = x
        return [feats[k] for k in self.outputs]


# ---------------------------------------------------------------- ConvNeXt

class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> pw expand 4x (gelu) -> pw reduce, layer-scale residual
    (convnext.py:101-137)."""

    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, name="dwconv")(x)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Dense(4 * self.dim, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + y * gamma


class ConvNeXt(nn.Module):
    """ConvNeXt-T style det backbone (convnext.py:18-99): 4x4 s4 patchify
    stem, LN+2x2 s2 downsample between stages."""

    depths: Sequence[int] = (3, 3, 9, 3)
    channels: Sequence[int] = (96, 192, 384, 768)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        outs = []
        x = nn.Conv(self.channels[0], (4, 4), strides=(4, 4), name="stem")(x)
        x = nn.LayerNorm(name="stem_norm")(x)
        for i in range(4):
            if i > 0:
                x = nn.LayerNorm(name=f"down_norm{i}")(x)
                x = nn.Conv(self.channels[i], (2, 2), strides=(2, 2),
                            name=f"down{i}")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.channels[i],
                                  name=f"stage{i}_b{j}")(x, train)
            # stage i has stride 4*2^i: stage1=s4 .. stage4=s32
            if f"stage{i + 1}" in self.outputs:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x))
        return outs


# ----------------------------------------------------------------- GhostNet

class GhostModule(nn.Module):
    """Primary 1x1 conv + cheap dw conv, concat (ghostnet.py:135-158)."""

    out_channels: int
    ksize: int = 1
    dw_size: int = 3
    act: str | None = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        init = self.out_channels // 2
        y1 = ConvBlock(init, ksize=self.ksize, norm="bn", act=self.act,
                       name="primary")(x, train)
        y2 = ConvBlock(init, ksize=self.dw_size, groups=init, norm="bn",
                       act=self.act, name="cheap")(y1, train)
        return jnp.concatenate([y1, y2], axis=-1)[..., :self.out_channels]


class GhostBottleneck(nn.Module):
    """ghost -> (dw stride) -> optional SE -> ghost-linear + shortcut
    (ghostnet.py:161-214)."""

    hidden: int
    out_channels: int
    dw_size: int = 3
    stride: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = GhostModule(self.hidden, name="ghost1")(x, train)
        if self.stride > 1:
            y = ConvBlock(self.hidden, ksize=self.dw_size, stride=self.stride,
                          groups=self.hidden, norm="bn", act=None,
                          name="dw")(y, train)
        if self.use_se:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.Conv(self.hidden // 4, (1, 1), name="se_fc1")(s)
            s = nn.relu(s)
            s = nn.Conv(self.hidden, (1, 1), name="se_fc2")(s)
            y = y * jnp.clip(s * 0.2 + 0.5, 0.0, 1.0)  # hard-sigmoid gate
        y = GhostModule(self.out_channels, act=None, name="ghost2")(y, train)
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            return y + x
        sc = ConvBlock(x.shape[-1], ksize=self.dw_size, stride=self.stride,
                       groups=x.shape[-1], norm="bn", act=None,
                       name="sc_dw")(x, train)
        sc = ConvBlock(self.out_channels, ksize=1, norm="bn", act=None,
                       name="sc_pw")(sc, train)
        return y + sc


# GhostNet-1.0 layer table: (dw_size, hidden, out, se, stride) per stage
_GHOST_STAGES = (
    ((3, 16, 16, False, 1), (3, 48, 24, False, 2), (3, 72, 24, False, 1)),
    ((5, 72, 40, True, 2), (5, 120, 40, True, 1)),
    ((3, 240, 80, False, 2), (3, 200, 80, False, 1), (3, 184, 80, False, 1),
     (3, 184, 80, False, 1), (3, 480, 112, True, 1), (3, 672, 112, True, 1)),
    ((5, 672, 160, True, 2), (5, 960, 160, False, 1), (5, 960, 160, True, 1),
     (5, 960, 160, False, 1), (5, 960, 160, True, 1)),
)


class GhostNet(nn.Module):
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        x = ConvBlock(16, ksize=3, stride=2, norm="bn", act="relu",
                      name="stem")(x, train)
        feats["stem"] = x
        for si, stage in enumerate(_GHOST_STAGES):
            for bi, (k, hid, out, se, s) in enumerate(stage):
                x = GhostBottleneck(hid, out, dw_size=k, stride=s, use_se=se,
                                    name=f"stage{si+1}_b{bi}")(x, train)
            feats[f"stage{si+1}"] = x
        return [feats[k] for k in self.outputs]


# --------------------------------------------------------------------- VGG

class VGG(nn.Module):
    """Plain VGG-style conv stack (vgg.py:13-44): conv-conv-pool stages."""

    channels: Sequence[int] = (64, 128, 256, 512, 512)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        pool = lambda v: jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            [(0, 0), (0, 0), (0, 0), (0, 0)])
        x = ConvBlock(self.channels[0], ksize=3, norm="bn", act="relu",
                      name="stem_c1")(x, train)
        x = ConvBlock(self.channels[0], ksize=3, norm="bn", act="relu",
                      name="stem_c2")(x, train)
        x = pool(x)
        feats["stem"] = x
        for i in range(4):
            ch = self.channels[min(i + 1, len(self.channels) - 1)]
            x = ConvBlock(ch, ksize=3, norm="bn", act="relu",
                          name=f"stage{i+1}_c1")(x, train)
            x = ConvBlock(ch, ksize=3, norm="bn", act="relu",
                          name=f"stage{i+1}_c2")(x, train)
            x = pool(x)
            feats[f"stage{i+1}"] = x
        return [feats[k] for k in self.outputs]


# ------------------------------------------------------------- MobileNeXt

class MobileNeXt(nn.Module):
    """Plain sandglass-block backbone (mobilenext.py:15-236)."""

    depths: Sequence[int] = (2, 2, 4, 2)
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        x = ConvBlock(self.channels[0], ksize=3, stride=2, norm="bn",
                      act="silu", name="stem")(x, train)
        feats["stem"] = x
        for i in range(4):
            ch = self.channels[i + 1]
            x = ConvBlock(ch, ksize=3, stride=2, norm="bn", act="silu",
                          name=f"stage{i+1}_down")(x, train)
            for j in range(self.depths[i]):
                x = SandglassBlock(ch, expansion=2.0,
                                   name=f"stage{i+1}_b{j}")(x, train)
            feats[f"stage{i+1}"] = x
        return [feats[k] for k in self.outputs]
