"""Decoupled detection head (YOLOX).

Capability parity with reference models/heads/decoupled_head.py:7-95:
per-level 1x1 stem to a common width, then parallel cls branch
(2x 3x3 conv -> 1x1 pred) and reg branch (2x 3x3 conv -> 1x1 box pred +
1x1 obj pred). cls/obj prediction biases initialized to
-log((1-p)/p), p=0.01 (decoupled_head.py:64-75). Output per level is the
channel-concat [reg(4), obj(1), cls(C)] map in NHWC.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers.blocks import Conv1x1, ConvBlock, DWConvBlock


def _prior_bias(prior_prob: float = 1e-2) -> float:
    return -math.log((1.0 - prior_prob) / prior_prob)


class DecoupledHead(nn.Module):
    num_classes: int = 80
    n_anchors: int = 1
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    norm: str = "bn"
    act: str = "silu"

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        width = self.in_channels[0]
        kw = dict(norm=self.norm, act=self.act)
        conv = DWConvBlock if self.depthwise else ConvBlock
        bias_init = nn.initializers.constant(_prior_bias())
        outputs = []
        for k, x in enumerate(inputs):
            x = ConvBlock(width, ksize=1, name=f"stem{k}", **kw)(x, train)
            cls_feat = conv(width, ksize=3, name=f"cls_conv{k}_0", **kw)(x, train)
            cls_feat = conv(width, ksize=3, name=f"cls_conv{k}_1", **kw)(cls_feat, train)
            # Conv1x1 = dot_general lowering, same param tree as nn.Conv
            # (the 1x1 pred wgrads were the worst conv rows, tools/perf_1x1.py)
            cls_out = Conv1x1(self.n_anchors * self.num_classes, use_bias=True,
                              bias_init=bias_init, name=f"cls_pred{k}")(cls_feat)
            reg_feat = conv(width, ksize=3, name=f"reg_conv{k}_0", **kw)(x, train)
            reg_feat = conv(width, ksize=3, name=f"reg_conv{k}_1", **kw)(reg_feat, train)
            reg_out = Conv1x1(self.n_anchors * 4, use_bias=True,
                              name=f"reg_pred{k}")(reg_feat)
            obj_out = Conv1x1(self.n_anchors * 1, use_bias=True,
                              bias_init=bias_init, name=f"obj_pred{k}")(reg_feat)
            outputs.append(jnp.concatenate([reg_out, obj_out, cls_out], axis=-1))
        return outputs
