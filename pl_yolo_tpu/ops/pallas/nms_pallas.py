"""Pallas TPU kernel: fused IoU + greedy-NMS suppression.

The jnp path (ops/nms.py) materializes the [K, K] IoU matrix in HBM
(4 MB/image at K=1024) before the suppression fixpoint reads it back. This
kernel keeps the score-sorted boxes AND the IoU/overlap matrix entirely in
VMEM: one grid step per image computes IoU -> thresholded strict-upper
overlap -> self-suppression fixpoint (see ops/nms.py greedy_suppress for
the exactness argument), writing only the [K] keep mask to HBM.

VMEM budget at K=1024: boxes 16 KB + overlap matrix 4 MB + masks — well
under the ~16 MB/core limit. The fixpoint matvec uses jnp.dot on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard for safety
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float):
    boxes = boxes_ref[0]                      # [K, 4] score-descending
    valid = valid_ref[0] > 0                  # [K, 1] -> bool
    k = boxes.shape[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    ix = jnp.maximum(
        jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)
    iy = jnp.maximum(
        jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = ix * iy
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # [K, 1]
    union = area + area.T - inter
    iou = inter / jnp.maximum(union, 1e-12)

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    over = jnp.where((iou > iou_threshold) & (row < col), 1.0, 0.0)

    valid_row = jnp.where(valid[:, 0], 1.0, 0.0)   # [K] f32 (Mosaic-friendly)

    def cond(state):
        alive, prev, it = state
        changed = jnp.sum(jnp.abs(alive - prev)) > 0.0
        return changed & (it < k)

    def body(state):
        alive, _, it = state
        killed = jnp.dot(alive[None, :], over,
                         preferred_element_type=jnp.float32)[0]
        new_alive = jnp.where(killed > 0.0, 0.0, valid_row)
        return new_alive, alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (valid_row, 1.0 - valid_row, jnp.int32(0)))
    out_ref[0] = alive[:, None]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_suppress(boxes: jax.Array, valid: jax.Array,
                    iou_threshold: float = 0.65,
                    interpret: bool = False) -> jax.Array:
    """Batched fused NMS suppression. boxes [B, K, 4] score-sorted xyxy
    (class-offset applied by the caller), valid [B, K] bool.
    Returns alive [B, K] bool."""
    b, k, _ = boxes.shape
    kern = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    if _HAS_PLTPU and not interpret:
        in_space = dict(memory_space=pltpu.VMEM)
        out_space = dict(memory_space=pltpu.VMEM)
    else:
        in_space = out_space = {}
    fn = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), **in_space),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0), **in_space),
        ],
        out_specs=pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0), **out_space),
        out_shape=jax.ShapeDtypeStruct((b, k, 1), jnp.float32),
        interpret=interpret,
    )
    out = fn(boxes, valid.astype(jnp.float32)[..., None])
    return out[..., 0] > 0.5
