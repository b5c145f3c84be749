"""ShuffleNetV2+ backbone.

Capability parity with reference models/backbones/shufflenetv2.py:19-262:
hswish 3x3 stem, 4 stages of Shufflenet / Shuffle-Xception units with the
reference's exact per-stage (kernel, block-type) layouts (:34-69), channel
split via channel-shuffle (even/odd interleave, :253-262). NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import ConvBlock


def channel_shuffle_split(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Interleaved channel split (shufflenetv2.py:253-262):
    returns (even channels, odd channels)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, c // 2, 2)
    return x[..., 0], x[..., 1]


class SELayer(nn.Module):
    reduction: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(ch // self.reduction, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(ch, (1, 1), name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class ShuffleUnit(nn.Module):
    """Shufflenet unit (shufflenetv2.py:115-172): pw -> dw kxk -> pw-linear
    main branch; stride-2 adds a dw+pw projection branch; stride-1 splits
    channels via shuffle."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    act: str = "hswish"
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stride == 1:
            x_proj, xm = channel_shuffle_split(x)
        else:
            x_proj, xm = x, x
        in_ch = xm.shape[-1]
        mid = self.out_channels // 2
        outputs = self.out_channels - in_ch
        kw = dict(norm="bn", act=self.act)
        y = ConvBlock(mid, ksize=1, name="pw1", **kw)(xm, train)
        y = ConvBlock(mid, ksize=self.ksize, stride=self.stride, groups=mid,
                      norm="bn", act=None, name="dw")(y, train)
        y = ConvBlock(outputs, ksize=1, name="pw2", **kw)(y, train)
        if self.use_se:
            y = SELayer(name="se")(y)
        if self.stride == 2:
            p = ConvBlock(in_ch, ksize=self.ksize, stride=2, groups=in_ch,
                          norm="bn", act=None, name="proj_dw")(x_proj, train)
            x_proj = ConvBlock(in_ch, ksize=1, name="proj_pw", **kw)(p, train)
        return jnp.concatenate([x_proj, y], axis=-1)


class ShuffleXception(nn.Module):
    """Shuffle-Xception unit (shufflenetv2.py:180-250): dw3-pw x3 main
    branch."""

    out_channels: int
    stride: int = 1
    act: str = "hswish"
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stride == 1:
            x_proj, xm = channel_shuffle_split(x)
        else:
            x_proj, xm = x, x
        in_ch = xm.shape[-1]
        mid = self.out_channels // 2
        outputs = self.out_channels - in_ch
        kw = dict(norm="bn", act=self.act)
        y = ConvBlock(in_ch, ksize=3, stride=self.stride, groups=in_ch,
                      norm="bn", act=None, name="dw1")(xm, train)
        y = ConvBlock(mid, ksize=1, name="pw1", **kw)(y, train)
        y = ConvBlock(mid, ksize=3, stride=self.stride, groups=mid,
                      norm="bn", act=None, name="dw2")(y, train)
        y = ConvBlock(mid, ksize=1, name="pw2", **kw)(y, train)
        y = ConvBlock(mid, ksize=3, stride=self.stride, groups=mid,
                      norm="bn", act=None, name="dw3")(y, train)
        y = ConvBlock(outputs, ksize=1, name="pw3", **kw)(y, train)
        if self.use_se:
            y = SELayer(name="se")(y)
        if self.stride == 2:
            p = ConvBlock(in_ch, ksize=3, stride=2, groups=in_ch,
                          norm="bn", act=None, name="proj_dw")(x_proj, train)
            x_proj = ConvBlock(in_ch, ksize=1, name="proj_pw", **kw)(p, train)
        return jnp.concatenate([x_proj, y], axis=-1)


# per-stage unit layouts (shufflenetv2.py:34-69): (type, ksize)
_STAGES = (
    (("s", 3), ("s", 3), ("x", 3), ("s", 5)),
    (("s", 3), ("s", 3), ("x", 3), ("x", 3)),
    (("s", 7), ("s", 3), ("s", 7), ("s", 5), ("s", 5), ("s", 3), ("s", 7), ("s", 3)),
    (("s", 7), ("s", 5), ("x", 3), ("s", 7)),
)


class ShuffleNetV2(nn.Module):
    channels: Sequence[int] = (36, 104, 208, 416)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")
    act: str = "hswish"
    use_se: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats = {}
        x = ConvBlock(16, ksize=3, stride=2, norm="bn", act="hswish",
                      name="stem")(x, train)
        feats["stem"] = x
        for si, stage in enumerate(_STAGES):
            ch = self.channels[si]
            for bi, (typ, k) in enumerate(stage):
                stride = 2 if bi == 0 else 1
                name = f"stage{si+1}_b{bi}"
                if typ == "s":
                    x = ShuffleUnit(ch, ksize=k, stride=stride, act=self.act,
                                    use_se=self.use_se, name=name)(x, train)
                else:
                    x = ShuffleXception(ch, stride=stride, act=self.act,
                                        use_se=self.use_se, name=name)(x, train)
            feats[f"stage{si+1}"] = x
        return [feats[k] for k in self.outputs]
