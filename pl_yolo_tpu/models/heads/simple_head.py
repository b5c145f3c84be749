"""Plain per-level 1x1 conv head.

Capability parity with reference models/heads/simple_head.py:4-27 (which has
an indexing bug at :25 — `head_conv[k]` after zip already selected the
module; fixed here, SURVEY.md §"Known reference bugs"). Used for the
YOLOv5-style anchor pipeline."""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from ...layers.blocks import Conv1x1


class SimpleHead(nn.Module):
    num_classes: int = 80
    n_anchors: int = 3
    in_channels: Sequence[int] = (256, 512, 1024)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False):
        ch = self.n_anchors * (5 + self.num_classes)
        return [Conv1x1(ch, use_bias=True, name=f"conv{k}")(x)
                for k, x in enumerate(inputs)]
