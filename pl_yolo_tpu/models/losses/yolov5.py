"""YOLOv5 anchor-based loss + decoder.

Capability parity with reference models/losses/yolov5/yolov5_loss.py:6-198
and yolov5_decoder.py:7-115: the classic 3-positive assignment (same
neighbor-grid scheme as YOLOv7's find_3_positive but with NO OTA refinement —
every wh-ratio-passing candidate is a positive), CIoU box loss, IoU-weighted
obj BCE with per-level balance, cls BCE; loss scaled by batch size
(yolov5_loss.py:147 `loss * bs`). Decode matches yolov7's anchor decode.

Fixed-shape TPU design: reuses the [M, L, na, 3] candidate slab from
losses/yolov7.py; every valid candidate is a positive matched to its own gt.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ...ops.boxes import ciou
from .yolov7 import _find_positive_candidates, flatten_v7_outputs, yolov7_eval_decode

DEFAULT_V5_ANCHORS = (((10, 13), (16, 30), (33, 23)),
                      ((30, 61), (62, 45), (59, 119)),
                      ((116, 90), (156, 198), (373, 326)))


def yolov5_eval_decode(outputs, strides, anchors, num_classes):
    """Identical decode math to YOLOv7 (yolov5_decoder.py:24-52)."""
    return yolov7_eval_decode(outputs, strides, anchors, num_classes)


def yolov5_loss(
    outputs: Sequence[jax.Array],
    labels: jax.Array,                 # [B, max_labels, 5] cls,cx,cy,w,h px
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    anchors=DEFAULT_V5_ANCHORS,
    anchor_threshold: float = 4.0,
    balance: Sequence[float] = (4.0, 1.0, 0.4),
    gain: dict | None = None,
) -> dict[str, jax.Array]:
    """Training loss (yolov5_loss.py:25-147), fully batched fixed-shape.

    `gain` optionally overrides the top-level weights (keys box/obj/cls;
    reference values kept when absent — the reference hardcodes them for
    640-px COCO at yolov5_loss.py:21-23). Upstream ultralytics scales
    obj by (imgsz/640)^2 at train time; see yolov7.py::yolov7_loss.
    """
    gain = gain or {}
    lambda_box = float(gain.get("box", 0.05))
    lambda_obj = float(gain.get("obj", 1.0))
    lambda_cls = float(gain.get("cls", 0.0375))

    shapes = tuple((o.shape[1], o.shape[2]) for o in outputs)
    d = flatten_v7_outputs(outputs, strides, anchors, num_classes)
    B, A, _ = d.flat.shape
    na = len(anchors[0])
    L = len(shapes)

    gt_valid = jnp.sum(labels, axis=2) > 0
    gt_classes = labels[..., 0].astype(jnp.int32)
    gt_boxes = labels[..., 1:5]
    M = gt_boxes.shape[1]

    def per_image(gb, gv):
        cells, ok, anchor_ids, level_ids = _find_positive_candidates(
            gb, gv, shapes, strides, anchors, threshold=anchor_threshold)
        Ca = M * L * na * 3
        return (cells.reshape(Ca, 2), ok.reshape(Ca),
                anchor_ids.reshape(Ca), level_ids.reshape(Ca))

    cells, ok, anchor_ids, level_ids = jax.vmap(per_image)(
        jax.lax.stop_gradient(gt_boxes), gt_valid)
    Ca = cells.shape[1]
    own_gt = jnp.tile(
        jnp.repeat(jnp.arange(M, dtype=jnp.int32), Ca // M)[None], (B, 1))

    # flat index per candidate
    level_offsets, level_ws, level_hws = [], [], []
    off = 0
    for (h, w), sz in zip(shapes, d.level_sizes):
        level_offsets.append(off)
        level_ws.append(w)
        level_hws.append(h * w)
        off += sz
    offs = jnp.asarray(level_offsets, jnp.int32)[level_ids]
    ws = jnp.asarray(level_ws, jnp.int32)[level_ids]
    hws = jnp.asarray(level_hws, jnp.int32)[level_ids]
    flat_idx = jnp.where(
        ok, offs + anchor_ids * hws + cells[..., 1] * ws + cells[..., 0], 0)

    take = jax.vmap(lambda arr, idx: arr[idx])
    pred_pos = take(d.flat, flat_idx)                     # [B, Ca, 5+C]
    anc = take(jnp.broadcast_to(d.anchor_wh[None], (B, A, 2)), flat_idx)
    stride_c = take(jnp.broadcast_to(d.strides[None], (B, A)), flat_idx)
    tgt_boxes = take(gt_boxes, own_gt)
    tgt_cls = take(gt_classes, own_gt)

    pxy = jax.nn.sigmoid(pred_pos[..., :2]) * 2.0 - 0.5
    pwh = (jax.nn.sigmoid(pred_pos[..., 2:4]) * 2.0) ** 2 * anc
    pbox = jnp.concatenate([pxy, pwh], axis=-1)
    txy = tgt_boxes[..., :2] / stride_c[..., None] - cells.astype(jnp.float32)
    twh = tgt_boxes[..., 2:4] / stride_c[..., None]
    tbox = jnp.concatenate([txy, twh], axis=-1)

    iou = ciou(pbox, tbox, fmt_cxcywh=True)
    ok_f = ok.astype(jnp.float32)

    def bce(logits, targets):
        return (jnp.maximum(logits, 0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    tobj = jnp.zeros((B, A), jnp.float32)
    iou_pos = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * ok_f
    tobj = jax.vmap(lambda t, idx, v: t.at[idx].max(v))(tobj, flat_idx, iou_pos)

    cls_logits = pred_pos[..., 5:]
    onehot = jax.nn.one_hot(tgt_cls, num_classes)
    cls_per_cand = jnp.sum(bce(cls_logits, onehot), axis=-1)

    box_loss, cls_loss = 0.0, 0.0
    for i in range(L):
        lvl = (level_ids == i).astype(jnp.float32) * ok_f
        n = jnp.sum(lvl)
        box_loss += jnp.where(
            n > 0, jnp.sum((1.0 - iou) * lvl) / jnp.maximum(n, 1.0), 0.0)
        if num_classes > 1:
            cls_loss += jnp.where(
                n > 0,
                jnp.sum(cls_per_cand * lvl) / jnp.maximum(n * num_classes, 1.0),
                0.0)

    obj_bce = bce(d.flat[..., 4], tobj)
    obj_loss = 0.0
    start = 0
    for i, sz in enumerate(d.level_sizes):
        obj_loss += jnp.mean(obj_bce[:, start:start + sz]) * balance[i]
        start += sz

    box_loss = box_loss * lambda_box
    obj_loss = obj_loss * lambda_obj
    cls_loss = cls_loss * lambda_cls
    loss = (box_loss + obj_loss + cls_loss) * B     # (yolov5_loss.py:147)
    return {"loss": loss, "loss_iou": box_loss, "loss_obj": obj_loss,
            "loss_cls": cls_loss,
            "proportion": jnp.sum(ok_f) / jnp.maximum(jnp.sum(gt_valid), 1)}
