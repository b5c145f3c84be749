"""CSP-PAFPN neck (YOLOX).

Capability parity with reference models/necks/pafpn_csp.py:7-86: top-down
path (1x1 shrink -> nearest 2x upsample -> concat -> CSP) then bottom-up
path (stride-2 3x3 conv -> concat -> CSP). 3 inputs / 3 outputs. NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import (ConvBlock, DWConvBlock, CSPLayer, maybe_remat,
                              upsample_nearest_2x)


class CSPPAFPN(nn.Module):
    depths: Sequence[int] = (1, 1, 1, 1)
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        c3, c4, c5 = inputs
        kw = dict(norm=self.norm, act=self.act)
        csp_kw = dict(shortcut=False, depthwise=self.depthwise, **kw)
        down = DWConvBlock if self.depthwise else ConvBlock

        # top-down
        p5_expand = ConvBlock(self.in_channels[1], ksize=1, name="shrink_conv1", **kw)(c5, train)
        p4 = jnp.concatenate([upsample_nearest_2x(p5_expand), c4], axis=-1)
        p4 = maybe_remat(CSPLayer)(self.in_channels[1], num_bottle=self.depths[0], name="p5_p4", **csp_kw)(p4, train)

        p4_expand = ConvBlock(self.in_channels[0], ksize=1, name="shrink_conv2", **kw)(p4, train)
        p3 = jnp.concatenate([upsample_nearest_2x(p4_expand), c3], axis=-1)
        p3 = maybe_remat(CSPLayer)(self.in_channels[0], num_bottle=self.depths[0], name="p4_p3", **csp_kw)(p3, train)

        # bottom-up
        n3 = p3
        n3_down = down(self.in_channels[0], ksize=3, stride=2, name="downsample_conv1", **kw)(n3, train)
        n4 = jnp.concatenate([n3_down, p4_expand], axis=-1)
        n4 = maybe_remat(CSPLayer)(self.in_channels[1], num_bottle=self.depths[0], name="n3_n4", **csp_kw)(n4, train)

        n4_down = down(self.in_channels[1], ksize=3, stride=2, name="downsample_conv2", **kw)(n4, train)
        n5 = jnp.concatenate([n4_down, p5_expand], axis=-1)
        n5 = maybe_remat(CSPLayer)(self.in_channels[2], num_bottle=self.depths[0], name="n4_n5", **csp_kw)(n5, train)

        return (n3, n4, n5)
