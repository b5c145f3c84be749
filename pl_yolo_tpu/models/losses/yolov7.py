"""YOLOv7 anchor-based loss: find-3-positive + OTA matching + CIoU/obj/cls.

Capability parity with reference models/losses/yolov7/yolov7_loss.py:9-415,
re-architected for TPU:

  * The reference builds dynamic-length candidate lists per level
    (find_3_positive, :308-368) and loops images in Python
    (build_targets, :155-306). Here every gt contributes a FIXED candidate
    slab [L levels x na anchors x 3 cells] (center + one x-neighbor + one
    y-neighbor, the g=0.5 scheme of :344-351) with validity masks, so the
    whole assignment is one vmapped fixed-shape computation.
  * OTA cost/dynamic-k/conflict resolution (:223-270) use the same masked
    top-k machinery as the SimOTA implementation (losses/yolox.py).
  * tobj scatter (:126) becomes a scatter-max into the flattened anchor
    grid (deterministic where the reference's duplicate writes are
    last-write-wins).

Decode (eval, :50-78): xy = (sig*2 - 0.5 + grid)*stride,
wh = (sig*2)^2 * anchor; obj/cls sigmoid; boxes to xyxy.

Loss weights (:26-29): balance (0.4, 1.0, 4) per level, box 0.05, obj 1,
cls 0.5*C/80; label smoothing via smooth_BCE (:371-373).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ...ops.boxes import ciou, cxcywh2xyxy, pairwise_iou
from ...ops.topk import topk_lastdim

INVALID_PENALTY = 1e9


class V7Decode(NamedTuple):
    flat: jax.Array        # [B, A, 5+C] raw logits, anchor-major per level
    grid_xy: jax.Array     # [A, 2] cell coords
    anchor_wh: jax.Array   # [A, 2] anchor sizes in grid units
    strides: jax.Array     # [A]
    level_id: jax.Array    # [A] int32
    level_sizes: tuple     # python tuple of per-level flat sizes (na*H*W)


def flatten_v7_outputs(outputs: Sequence[jax.Array], strides: Sequence[int],
                       anchors, num_classes: int) -> V7Decode:
    """Per-level NHWC maps [B,H,W,na*(5+C)] -> flat [B, A, 5+C] with
    per-row grid/anchor metadata. Row order: level-major, anchor-major,
    then row-major cells (a*H*W + y*W + x)."""
    na = len(anchors[0])
    ch = 5 + num_classes
    flats, gxy, awh, ss, lid, sizes = [], [], [], [], [], []
    for i, (level, stride) in enumerate(zip(outputs, strides)):
        level = level.astype(jnp.float32)  # decode/loss math stays fp32
        b, h, w, _ = level.shape
        x = level.reshape(b, h, w, na, ch).transpose(0, 3, 1, 2, 4)
        flats.append(x.reshape(b, na * h * w, ch))
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        cell = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)      # [H*W, 2]
        gxy.append(jnp.tile(cell, (na, 1)))
        anc = jnp.asarray(anchors[i], jnp.float32) / stride          # grid units
        awh.append(jnp.repeat(anc, h * w, axis=0))
        ss.append(jnp.full((na * h * w,), stride, jnp.float32))
        lid.append(jnp.full((na * h * w,), i, jnp.int32))
        sizes.append(na * h * w)
    return V7Decode(
        flat=jnp.concatenate(flats, axis=1),
        grid_xy=jnp.concatenate(gxy),
        anchor_wh=jnp.concatenate(awh),
        strides=jnp.concatenate(ss),
        level_id=jnp.concatenate(lid),
        level_sizes=tuple(sizes),
    )


def yolov7_eval_decode(outputs: Sequence[jax.Array], strides: Sequence[int],
                       anchors, num_classes: int) -> jax.Array:
    """Eval decode (yolov7_loss.py:50-78) -> [B, A, 5+C] xyxy + probs."""
    d = flatten_v7_outputs(outputs, strides, anchors, num_classes)
    p = jax.nn.sigmoid(d.flat)
    xy = (p[..., :2] * 2.0 - 0.5 + d.grid_xy[None]) * d.strides[None, :, None]
    wh = (p[..., 2:4] * 2.0) ** 2 * (d.anchor_wh * d.strides[:, None])[None]
    boxes = cxcywh2xyxy(jnp.concatenate([xy, wh], axis=-1))
    return jnp.concatenate([boxes, p[..., 4:]], axis=-1)


def _find_positive_candidates(gt_boxes, gt_valid, shapes, strides, anchors,
                              threshold: float = 4.0):
    """Fixed-shape find_3_positive (yolov7_loss.py:308-368) for ONE image.

    gt_boxes: [M, 4] cxcywh pixels. shapes: tuple of (H, W) per level.
    Returns per-candidate arrays of shape [M, L, na, 3]:
      cell_xy int32, anchor_idx, level_idx, valid.
    """
    M = gt_boxes.shape[0]
    L = len(shapes)
    na = len(anchors[0])
    cells, valids, anchor_ids, level_ids = [], [], [], []
    for i, ((h, w), stride) in enumerate(zip(shapes, strides)):
        t_xy = gt_boxes[:, :2] / stride                 # [M, 2] grid units
        t_wh = gt_boxes[:, 2:4] / stride
        anc = jnp.asarray(anchors[i], jnp.float32) / stride  # [na, 2]
        r = t_wh[:, None, :] / anc[None, :, :]          # [M, na, 2]
        wh_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < threshold
        wh_ok = wh_ok & gt_valid[:, None]

        gx, gy = t_xy[:, 0], t_xy[:, 1]
        fx, fy = gx % 1.0, gy % 1.0
        # x neighbor: left cell if frac<.5 (j), right if frac>.5 via inverse
        # test (yolov7_loss.py:347-348)
        j = (fx < 0.5) & (gx > 1.0)
        l = (((w - gx) % 1.0) < 0.5) & ((w - gx) > 1.0)
        k = (fy < 0.5) & (gy > 1.0)
        m = (((h - gy) % 1.0) < 0.5) & ((h - gy) > 1.0)
        x_off = jnp.where(j, 0.5, jnp.where(l, -0.5, jnp.nan))
        y_off = jnp.where(k, 0.5, jnp.where(m, -0.5, jnp.nan))
        x_nb_ok = j | l
        y_nb_ok = k | m

        center = jnp.floor(t_xy)
        x_nb = jnp.stack([jnp.floor(gx - jnp.nan_to_num(x_off)), jnp.floor(gy)], -1)
        y_nb = jnp.stack([jnp.floor(gx), jnp.floor(gy - jnp.nan_to_num(y_off))], -1)
        cand = jnp.stack([center, x_nb, y_nb], axis=1)  # [M, 3, 2]
        cand = jnp.clip(cand, 0, jnp.asarray([w - 1, h - 1], jnp.float32))
        cand_ok = jnp.stack(
            [jnp.ones_like(x_nb_ok), x_nb_ok, y_nb_ok], axis=1)  # [M, 3]

        cells.append(jnp.broadcast_to(cand[:, None, :, :], (M, na, 3, 2)))
        valids.append(wh_ok[:, :, None] & cand_ok[:, None, :])
        anchor_ids.append(jnp.broadcast_to(
            jnp.arange(na, dtype=jnp.int32)[None, :, None], (M, na, 3)))
        level_ids.append(jnp.full((M, na, 3), i, jnp.int32))
    stack = lambda xs: jnp.stack(xs, axis=1)            # -> [M, L, na, 3, ...]
    return (stack(cells).astype(jnp.int32), stack(valids),
            stack(anchor_ids), stack(level_ids))


def _assign_one(gt_boxes, gt_classes, gt_valid, flat_preds, d: V7Decode,
                shapes, strides, anchors, num_classes: int):
    """Per-image OTA assignment over the fixed candidate slab.

    Returns (flat_idx [Ca], matched_gt [Ca], fg [Ca]) with Ca = M*L*na*3
    candidate rows indexing into the flattened anchor grid.
    """
    M = gt_boxes.shape[0]
    na = len(anchors[0])
    cells, valid, anchor_ids, level_ids = _find_positive_candidates(
        gt_boxes, gt_valid, shapes, strides, anchors)
    Ca = M * len(shapes) * na * 3
    cells = cells.reshape(Ca, 2)
    valid = valid.reshape(Ca)
    anchor_ids = anchor_ids.reshape(Ca)
    level_ids = level_ids.reshape(Ca)
    own_gt = jnp.repeat(jnp.arange(M, dtype=jnp.int32), Ca // M)

    # flat index into [A]: level_offset + a*H*W + y*W + x
    level_offsets, level_hw = [], []
    off = 0
    for (h, w), sz in zip(shapes, d.level_sizes):
        level_offsets.append(off)
        level_hw.append((h, w))
        off += sz
    offs = jnp.asarray(level_offsets, jnp.int32)[level_ids]
    ws = jnp.asarray([w for _, w in level_hw], jnp.int32)[level_ids]
    hws = jnp.asarray([h * w for h, w in level_hw], jnp.int32)[level_ids]
    flat_idx = offs + anchor_ids * hws + cells[:, 1] * ws + cells[:, 0]
    flat_idx = jnp.where(valid, flat_idx, 0)

    # decode candidate predictions (build_targets :200-209)
    pred = flat_preds[flat_idx]                          # [Ca, 5+C]
    stride_c = d.strides[flat_idx]
    anc_c = d.anchor_wh[flat_idx]
    sig_xy = jax.nn.sigmoid(pred[:, :2])
    pxy = (sig_xy * 2.0 - 0.5 + cells.astype(jnp.float32)) * stride_c[:, None]
    pwh = (jax.nn.sigmoid(pred[:, 2:4]) * 2.0) ** 2 * anc_c * stride_c[:, None]
    pboxes = jnp.concatenate([pxy, pwh], axis=-1)

    # cost (build_targets :223-252)
    iou = pairwise_iou(cxcywh2xyxy(gt_boxes), cxcywh2xyxy(pboxes))  # [M, Ca]
    iou = jnp.where(gt_valid[:, None] & valid[None, :], iou, 0.0)
    iou_cost = -jnp.log(iou + 1e-8)

    p = jnp.sqrt(jax.nn.sigmoid(pred[:, 5:])
                 * jax.nn.sigmoid(pred[:, 4])[:, None])   # [Ca, C]
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    logit = jnp.log(p) - jnp.log1p(-p)
    # BCE-with-logits(logit(y), onehot) == BCE(y, onehot); decompose one-hot
    log_p = jax.nn.log_sigmoid(logit)
    log_1mp = jax.nn.log_sigmoid(-logit)
    s_all = -jnp.sum(log_1mp, axis=-1)                    # [Ca]
    cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
    cls_cost = s_all[None, :] - log_p[:, cls_idx].T + log_1mp[:, cls_idx].T

    mask = gt_valid[:, None] & valid[None, :]
    cost = cls_cost + 3.0 * iou_cost + INVALID_PENALTY * (~mask)

    topk_iou = topk_lastdim(iou, min(10, Ca))
    dynamic_k = jnp.clip(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1, 10)
    neg_top = topk_lastdim(-cost, 10)
    kth = -jnp.take_along_axis(neg_top, dynamic_k[:, None] - 1, axis=1)[:, 0]
    matching = (cost <= kth[:, None]) & mask

    # conflicted candidates are FORCE-assigned to the argmin-cost gt
    # (reference yolov7_loss.py conflict block zeroes then sets argmin row)
    n_claims = jnp.sum(matching, axis=0)
    argmin_gt = jnp.argmin(cost, axis=0)
    only_min = jax.nn.one_hot(argmin_gt, M, dtype=bool).T & mask
    matching = jnp.where(n_claims[None, :] > 1, only_min, matching)

    fg = jnp.any(matching, axis=0)
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
    return flat_idx, matched_gt, fg, level_ids, cells, stride_c, anc_c


def yolov7_loss(
    outputs: Sequence[jax.Array],
    labels: jax.Array,                  # [B, max_labels, 5] cls,cx,cy,w,h
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    anchors=(((12, 16), (19, 36), (40, 28)),
             ((36, 75), (76, 55), (72, 146)),
             ((142, 110), (192, 243), (459, 401))),
    label_smoothing: float = 0.0,
    balance: Sequence[float] = (4.0, 1.0, 0.4),
    gain: dict | None = None,
) -> dict[str, jax.Array]:
    """Training loss (yolov7_loss.py:80-153), fully batched.

    DELIBERATE DEVIATION: the reference hardcodes balance (0.4, 1.0, 4)
    (yolov7_loss.py:26), which puts the 4.0 obj weight on the stride-32
    level — the reverse of upstream ultralytics yolov7 ([4.0, 1.0, 0.4]
    for P3,P4,P5), i.e. a copy error that down-weights small objects 10x.
    Measured on the hard-shapes gate (160 px, 100 epochs, autoanchor):
    reference order mAP 0.0432, ultralytics order 0.0685 (+59%) —
    GATE_RESULTS.jsonl 2026-08-20. Default = ultralytics order; the
    reference order stays selectable via `loss: {balance: [0.4, 1, 4]}`
    (and the parity test vs the reference torch loss pins it explicitly).

    `gain` optionally overrides the top-level loss weights (keys box/obj/
    cls; missing keys keep the reference values above). The reference
    hardcodes obj=1.0 for 640-px COCO; upstream ultralytics scales it by
    (imgsz/640)^2 at train time (yolov5 train.py `hyp['obj'] *=
    (imgsz/640)**2`). MEASURED NEGATIVE at the 160-px gate: obj=0.0625
    collapses held-out mAP 0.0685 -> 0.0021 at 100 epochs (obj is the
    detection-confidence signal; downweighting it 16x leaves objectness
    untrained) — GATE_RESULTS.jsonl 2026-08-20. The 640-COCO gain set
    stands as the default at every scale; `gain:` remains available for
    recipe experiments (tools/accuracy_gate.py --scale-gains A/Bs it).
    """
    gain = gain or {}
    box_ratio = float(gain.get("box", 0.05))
    obj_ratio = float(gain.get("obj", 1.0))
    cls_ratio = float(gain.get("cls", 0.5 * (num_classes / 80.0)))
    cp = 1.0 - 0.5 * label_smoothing
    cn = 0.5 * label_smoothing

    shapes = tuple((o.shape[1], o.shape[2]) for o in outputs)
    d = flatten_v7_outputs(outputs, strides, anchors, num_classes)
    B, A, ch = d.flat.shape

    gt_valid = jnp.sum(labels, axis=2) > 0
    gt_classes = labels[..., 0].astype(jnp.int32)
    gt_boxes = labels[..., 1:5]

    assign = jax.vmap(lambda gb, gc, gv, fp: _assign_one(
        gb, gc, gv, fp, d, shapes, strides, anchors, num_classes))
    flat_idx, matched_gt, fg, cand_level, cand_cells, cand_stride, cand_anc = \
        assign(jax.lax.stop_gradient(gt_boxes), gt_classes, gt_valid,
               jax.lax.stop_gradient(d.flat))

    take = jax.vmap(lambda arr, idx: arr[idx])
    pred_pos = take(d.flat, flat_idx)                   # [B, Ca, 5+C]
    tgt_boxes = take(gt_boxes, matched_gt)              # [B, Ca, 4] pixels
    tgt_cls = take(gt_classes, matched_gt)              # [B, Ca]

    # decode positives in grid units (yolov7_loss.py:112-118)
    pxy = jax.nn.sigmoid(pred_pos[..., :2]) * 2.0 - 0.5
    pwh = (jax.nn.sigmoid(pred_pos[..., 2:4]) * 2.0) ** 2 * cand_anc
    pbox = jnp.concatenate([pxy, pwh], axis=-1)
    txy = tgt_boxes[..., :2] / cand_stride[..., None] - cand_cells
    twh = tgt_boxes[..., 2:4] / cand_stride[..., None]
    tbox = jnp.concatenate([txy, twh], axis=-1)

    iou = ciou(pbox, tbox, fmt_cxcywh=True)             # [B, Ca]
    fg_f = fg.astype(jnp.float32)

    # per-level box loss: mean of (1 - ciou) over that level's positives
    def bce(logits, targets):
        return (jnp.maximum(logits, 0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    box_loss = 0.0
    cls_loss = 0.0
    # tobj via scatter-max of clamped IoU (yolov7_loss.py:126)
    tobj = jnp.zeros((B, A), jnp.float32)
    iou_pos = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * fg_f
    tobj = jax.vmap(lambda t, idx, v: t.at[idx].max(v))(tobj, flat_idx, iou_pos)

    # cls BCE over positives with smoothed one-hot (mean over n*C per level)
    cls_logits = pred_pos[..., 5:]
    bce_cn = bce(cls_logits, cn)                        # [B, Ca, C]
    onehot = jax.nn.one_hot(tgt_cls, num_classes)
    bce_adjust = bce(cls_logits, cp) - bce(cls_logits, cn)
    cls_per_cand = jnp.sum(bce_cn + onehot * bce_adjust, axis=-1)

    for i in range(len(shapes)):
        lvl = (cand_level == i).astype(jnp.float32) * fg_f
        n = jnp.sum(lvl)
        box_loss += jnp.where(
            n > 0, jnp.sum((1.0 - iou) * lvl) / jnp.maximum(n, 1.0), 0.0)
        cls_loss += jnp.where(
            n > 0,
            jnp.sum(cls_per_cand * lvl) / jnp.maximum(n * num_classes, 1.0),
            0.0)

    # per-level obj BCE over every cell, balanced (yolov7_loss.py:140)
    obj_logits = d.flat[..., 4]
    obj_bce = bce(obj_logits, tobj)                     # [B, A]
    obj_loss = 0.0
    start = 0
    for i, sz in enumerate(d.level_sizes):
        obj_loss += jnp.mean(obj_bce[:, start:start + sz]) * balance[i]
        start += sz

    box_loss = box_loss * box_ratio
    obj_loss = obj_loss * obj_ratio
    cls_loss = cls_loss * cls_ratio
    loss = box_loss + obj_loss + cls_loss
    return {"loss": loss, "loss_iou": box_loss, "loss_obj": obj_loss,
            "loss_cls": cls_loss,
            "proportion": jnp.sum(fg_f) / jnp.maximum(jnp.sum(gt_valid), 1)}
