"""Implicit head (YOLOv7 / YOLOR).

Capability parity with reference models/heads/implicit_head.py:5-62:
per-level learned additive prior (ImplicitA, init N(0, 0.02)) -> 1x1 conv to
na*(5+C) -> learned multiplicative prior (ImplicitM, init N(1, 0.02)).
Output layout per level: [B, H, W, na*(5+C)] with per-anchor channel blocks
[x, y, w, h, obj, cls...] (the anchor-based decode contract,
yolov7_loss.py:53-78). NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from ...layers.blocks import Conv1x1


class ImplicitHead(nn.Module):
    num_classes: int = 80
    n_anchors: int = 3
    in_channels: Sequence[int] = (256, 512, 1024)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        ch = self.n_anchors * (5 + self.num_classes)
        outputs = []
        for k, x in enumerate(inputs):
            ia = self.param(f"ia{k}", nn.initializers.normal(0.02),
                            (1, 1, 1, x.shape[-1]))
            x = x + ia
            x = Conv1x1(ch, use_bias=True, name=f"conv{k}")(x)
            im = self.param(
                f"im{k}",
                lambda key, shape: 1.0 + nn.initializers.normal(0.02)(key, shape),
                (1, 1, 1, ch))
            outputs.append(x * im)
        return outputs
