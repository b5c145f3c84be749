"""Deploy-time branch fusion: conv+BN folding and RepConv collapse.

Capability parity with the reference's fuse paths (BaseConv.fuseforward,
network_blocks.py:39-40, and RepConv.get_equivalent_kernel_bias /
fuse_repvgg_block, yolov7_neck.py:213-348): fold BatchNorm statistics into
conv kernels and collapse RepConv's (3x3+BN, 1x1+BN, identity-BN) branches
into a single biased 3x3 conv. Operates on flax param/batch-stats pytrees
(params stay a valid tree for the fused module variants).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..layers.blocks import BN_EPS


def fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps: float = BN_EPS):
    """Fold BN(y) = scale*(y-mean)/sqrt(var+eps)+bias into conv kernel/bias.

    kernel: [kh, kw, cin, cout] (flax HWIO). Returns (kernel', bias')."""
    std = jnp.sqrt(bn_var + eps)
    factor = bn_scale / std
    fused_kernel = kernel * factor[None, None, None, :]
    fused_bias = bn_bias - bn_mean * factor
    return fused_kernel, fused_bias


def fuse_repconv(params: dict, batch_stats: dict, eps: float = BN_EPS):
    """Collapse a RepConv's branches (models/necks/yolov7_neck.py RepConv)
    into one 3x3 (kernel, bias).

    params/batch_stats: the RepConv submodule trees with keys
    rbr_dense_conv/rbr_dense_bn, rbr_1x1_conv/rbr_1x1_bn, optional
    rbr_identity."""
    k3, b3 = fuse_conv_bn(
        params["rbr_dense_conv"]["kernel"],
        params["rbr_dense_bn"]["scale"], params["rbr_dense_bn"]["bias"],
        batch_stats["rbr_dense_bn"]["mean"], batch_stats["rbr_dense_bn"]["var"],
        eps)
    k1, b1 = fuse_conv_bn(
        params["rbr_1x1_conv"]["kernel"],
        params["rbr_1x1_bn"]["scale"], params["rbr_1x1_bn"]["bias"],
        batch_stats["rbr_1x1_bn"]["mean"], batch_stats["rbr_1x1_bn"]["var"],
        eps)
    # pad 1x1 -> 3x3 (yolov7_neck.py:222-227)
    k1 = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    kernel = k3 + k1
    bias = b3 + b1
    if "rbr_identity" in params:
        cin = kernel.shape[2]
        ident = jnp.zeros_like(k3)
        idx = np.arange(cin)
        ident = ident.at[1, 1, idx, idx].set(1.0)
        ki, bi = fuse_conv_bn(
            ident,
            params["rbr_identity"]["scale"], params["rbr_identity"]["bias"],
            batch_stats["rbr_identity"]["mean"],
            batch_stats["rbr_identity"]["var"], eps)
        kernel = kernel + ki
        bias = bias + bi
    return kernel, bias
