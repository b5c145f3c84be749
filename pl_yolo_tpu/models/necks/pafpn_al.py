"""AL-PAFPN neck: bicubic-upsample PAFPN with channel-preserving mobile CSP
layers.

Capability parity with reference models/necks/pafpn_al.py:7-183: top-down
(1x1 shrink -> bicubic 2x upsample -> concat -> 1x1 shrink -> mobile CSP)
then bottom-up (3x3 s2 conv -> concat -> mobile CSP). Channel plan assumes
in_channels[i+1] == 2*in_channels[i]."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import ConvBlock
from ..backbones.mobile import MobileCSPLayer


def upsample_bicubic_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bicubic")


class AL_PAFPN(nn.Module):
    depths: Sequence[int] = (1, 1, 1, 1)
    in_channels: Sequence[int] = (256, 512, 1024)
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        c3, c4, c5 = inputs
        ch = self.in_channels
        kw = dict(norm=self.norm, act=self.act)
        csp = lambda d, name: MobileCSPLayer(num_bottle=d, shortcut=False,
                                             norm=self.norm, act=self.act,
                                             name=name)
        p5_expand = ConvBlock(ch[1], ksize=1, name="shrink_conv1", **kw)(c5, train)
        p4 = jnp.concatenate([upsample_bicubic_2x(p5_expand), c4], axis=-1)
        p4 = ConvBlock(ch[1], ksize=1, name="shrink_conv2", **kw)(p4, train)
        p4 = csp(self.depths[0], "p5_p4")(p4, train)

        p4_expand = ConvBlock(ch[0], ksize=1, name="shrink_conv3", **kw)(p4, train)
        p3 = jnp.concatenate([upsample_bicubic_2x(p4_expand), c3], axis=-1)
        p3 = ConvBlock(ch[0], ksize=1, name="shrink_conv4", **kw)(p3, train)
        p3 = csp(self.depths[0], "p4_p3")(p3, train)

        n3 = p3
        n3_down = ConvBlock(ch[0], ksize=3, stride=2, name="downsample_conv1",
                            **kw)(n3, train)
        n4 = jnp.concatenate([n3_down, p4_expand], axis=-1)
        n4 = csp(self.depths[0], "n3_n4")(n4, train)

        n4_down = ConvBlock(ch[1], ksize=3, stride=2, name="downsample_conv2",
                            **kw)(n4, train)
        n5 = jnp.concatenate([n4_down, p5_expand], axis=-1)
        n5 = csp(self.depths[0], "n4_n5")(n5, train)
        return (n3, n4, n5)
