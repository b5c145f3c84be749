"""CSPDarkNet backbone (YOLOX family).

Capability parity with reference models/backbones/darknet_csp.py:15-75:
Focus stem + 4 stages of (stride-2 3x3 conv -> CSPLayer); SPP inserted in
stage4 before a non-shortcut CSPLayer. Returns the feature maps named in
`outputs` (default stage2/3/4 -> strides 8/16/32). NHWC.

Depths / channels presets (darknet_csp.py:1-8):
    tiny  (1,3,3,1)   (24,48,96,192,384)
    small (2,6,6,2)   (32,64,128,256,512)    # note: yolox_s.yaml uses (1,3,3,1)
    base  (3,9,9,3)   (64,128,256,512,1024)
    large (4,12,12,4) (64,128,256,512,1024)
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from ...layers.blocks import (ConvBlock, DWConvBlock, CSPLayer, Focus,
                              SPPBottleneck, maybe_remat)
from ...layers.drops import DropBlock2d


class CSPDarkNet(nn.Module):
    # Focus stem => the trainer may feed pre-space-to-depth'ed input
    # (layers/blocks.py::stem_input_s2d + device_augment(out_s2d=True))
    STEM_S2D = True

    depths: Sequence[int] = (3, 9, 9, 3)
    channels: Sequence[int] = (64, 128, 256, 512, 1024)
    outputs: Sequence[str] = ("stage2", "stage3", "stage4")
    depthwise: bool = False
    norm: str = "bn"
    act: str = "silu"
    # DropBlock regularization after each stage's CSP layer (reference
    # models/layers/drops.py:22-100 — importable-but-unwired there; wired
    # here via `backbone: {drop_block: {rate, size}}`). Train-mode only;
    # identity in eval.
    drop_block_rate: float = 0.0
    drop_block_size: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        kw = dict(norm=self.norm, act=self.act)
        down = DWConvBlock if self.depthwise else ConvBlock
        feats = {}
        x = Focus(self.channels[0], ksize=3, name="stem", **kw)(x, train)
        feats["stem"] = x
        for i in range(4):
            ch = self.channels[i + 1]
            x = down(ch, ksize=3, stride=2, name=f"stage{i + 1}_down", **kw)(x, train)
            if i == 3:
                x = SPPBottleneck(ch, name="stage4_spp", **kw)(x, train)
            x = maybe_remat(CSPLayer)(
                ch,
                num_bottle=self.depths[i],
                shortcut=(i != 3),
                depthwise=self.depthwise,
                name=f"stage{i + 1}_csp",
                **kw,
            )(x, train)
            if self.drop_block_rate > 0.0:
                x = DropBlock2d(self.drop_block_rate, self.drop_block_size,
                                name=f"stage{i + 1}_dropblock")(
                    x, deterministic=not train)
            feats[f"stage{i + 1}"] = x
        return [feats[k] for k in self.outputs]
