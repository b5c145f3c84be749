"""Numpy oracle implementations used to verify the fixed-shape TPU ops.

These mirror the *algorithms* of the reference (dynamic shapes, per-gt
loops — fine in test code) so the batched jnp versions can be checked
against them on random inputs.
"""

from __future__ import annotations

import numpy as np


def np_pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def np_greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> list[int]:
    """Exact greedy NMS (torchvision.ops.nms semantics): boxes xyxy, returns
    kept indices in score-descending order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        ious = np_pairwise_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= ious > iou_thr
        suppressed[i] = True
    return keep


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_simota(gt_boxes, gt_classes, pred_boxes, obj_logits, cls_logits,
              x_shifts, y_shifts, strides, center_radius=2.5):
    """Dynamic-shape SimOTA for one image, mirroring the reference loop
    (yolox_loss.py:54-139, get_in_boxes_info :231-315,
    dynamic_k_matching :318-370). gt/pred boxes are cxcywh.

    Returns (fg_mask [A] bool, matched_gt [A] int (-1 where bg),
             pred_ious [A], num_fg).
    """
    num_gt = len(gt_boxes)
    A = len(pred_boxes)
    C = cls_logits.shape[1]
    fg_mask = np.zeros(A, dtype=bool)
    matched_gt = -np.ones(A, dtype=np.int64)
    pred_ious = np.zeros(A, dtype=np.float64)
    if num_gt == 0:
        return fg_mask, matched_gt, pred_ious, 0

    xc = (x_shifts + 0.5) * strides
    yc = (y_shifts + 0.5) * strides
    gx, gy, gw, gh = gt_boxes.T
    in_box = ((xc[None] > (gx - gw / 2)[:, None]) & (xc[None] < (gx + gw / 2)[:, None])
              & (yc[None] > (gy - gh / 2)[:, None]) & (yc[None] < (gy + gh / 2)[:, None]))
    rad = center_radius * strides[None]
    in_ctr = ((xc[None] > gx[:, None] - rad) & (xc[None] < gx[:, None] + rad)
              & (yc[None] > gy[:, None] - rad) & (yc[None] < gy[:, None] + rad))
    cand = (in_box.any(0) | in_ctr.any(0))            # [A]
    box_and_ctr = in_box[:, cand] & in_ctr[:, cand]   # [num_gt, A_cand]

    def to_xyxy(b):
        out = b.copy()
        out[:, :2] = b[:, :2] - b[:, 2:] / 2
        out[:, 2:] = b[:, :2] + b[:, 2:] / 2
        return out

    cand_idx = np.where(cand)[0]
    iou = np_pairwise_iou(to_xyxy(gt_boxes), to_xyxy(pred_boxes[cand]))
    iou_cost = -np.log(iou + 1e-8)
    p = np.sqrt(_sigmoid(cls_logits[cand]) * _sigmoid(obj_logits[cand])[:, None])
    onehot = np.eye(C)[gt_classes.astype(int)]         # [num_gt, C]
    eps = 1e-12
    bce = -(onehot[:, None, :] * np.log(p[None] + eps)
            + (1 - onehot[:, None, :]) * np.log(1 - p[None] + eps)).sum(-1)
    cost = bce + 3.0 * iou_cost + 100000.0 * (~box_and_ctr)

    n_k = min(10, iou.shape[1])
    topk = -np.sort(-iou, axis=1)[:, :n_k]
    dyn_k = np.clip(topk.sum(1).astype(int), 1, None)

    matching = np.zeros_like(cost)
    for g in range(num_gt):
        pos = np.argsort(cost[g], kind="stable")[:dyn_k[g]]
        matching[g, pos] = 1.0
    multi = matching.sum(0) > 1
    if multi.any():
        best = cost[:, multi].argmin(0)
        matching[:, multi] = 0.0
        matching[best, np.where(multi)[0]] = 1.0
    fg_in_cand = matching.sum(0) > 0
    fg_idx = cand_idx[fg_in_cand]
    fg_mask[fg_idx] = True
    matched = matching[:, fg_in_cand].argmax(0)
    matched_gt[fg_idx] = matched
    pred_ious[fg_idx] = (matching * iou).sum(0)[fg_in_cand]
    return fg_mask, matched_gt, pred_ious, int(fg_in_cand.sum())
