"""Box format conversions and IoU family — fixed-shape jnp ops.

Capability parity with reference models/utils/bbox.py:5-143 and
models/layers/losses/iou_loss.py:330-414. All functions are shape-polymorphic
pure jnp and safe under jit/vmap; numpy arrays also work (for host-side eval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xyxy2cxcywh(boxes):
    """[x1,y1,x2,y2] -> [cx,cy,w,h] (reference bbox.py xyxy2cxcywh)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate([x1 + w * 0.5, y1 + h * 0.5, w, h], axis=-1)


def cxcywh2xyxy(boxes):
    """[cx,cy,w,h] -> [x1,y1,x2,y2]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def xyxy2xywh(boxes):
    """[x1,y1,x2,y2] -> COCO [x,y,w,h] (reference bbox.py xyxy2xywh)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(boxes):
    """COCO [x,y,w,h] -> [x1,y1,x2,y2]."""
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def pairwise_iou(boxes_a, boxes_b, fmt_cxcywh: bool = False):
    """Pairwise IoU matrix [N, M] (reference bboxes_iou, iou_loss.py:392-414).

    boxes_a: [N, 4], boxes_b: [M, 4]; xyxy unless fmt_cxcywh.
    """
    if fmt_cxcywh:
        boxes_a = cxcywh2xyxy(boxes_a)
        boxes_b = cxcywh2xyxy(boxes_b)
    tl = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    br = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(jnp.clip(boxes_a[:, 2:] - boxes_a[:, :2], 0.0), axis=-1)
    area_b = jnp.prod(jnp.clip(boxes_b[:, 2:] - boxes_b[:, :2], 0.0), axis=-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def elementwise_iou(pred, target, fmt_cxcywh: bool = True, eps: float = 1e-16):
    """Elementwise IoU of aligned box arrays [..., 4]."""
    if fmt_cxcywh:
        pred = cxcywh2xyxy(pred)
        target = cxcywh2xyxy(target)
    tl = jnp.maximum(pred[..., :2], target[..., :2])
    br = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.prod(jnp.clip(pred[..., 2:] - pred[..., :2], 0.0), axis=-1)
    area_t = jnp.prod(jnp.clip(target[..., 2:] - target[..., :2], 0.0), axis=-1)
    union = area_p + area_t - inter
    return inter / jnp.maximum(union, eps)


def giou(pred, target, fmt_cxcywh: bool = True, eps: float = 1e-16):
    """Elementwise generalized IoU (reference IOUloss giou branch,
    iou_loss.py:30-44)."""
    if fmt_cxcywh:
        pred = cxcywh2xyxy(pred)
        target = cxcywh2xyxy(target)
    iou = elementwise_iou(pred, target, fmt_cxcywh=False, eps=eps)
    ctl = jnp.minimum(pred[..., :2], target[..., :2])
    cbr = jnp.maximum(pred[..., 2:], target[..., 2:])
    cwh = jnp.clip(cbr - ctl, 0.0)
    c_area = jnp.maximum(cwh[..., 0] * cwh[..., 1], eps)
    area_p = jnp.prod(jnp.clip(pred[..., 2:] - pred[..., :2], 0.0), axis=-1)
    area_t = jnp.prod(jnp.clip(target[..., 2:] - target[..., :2], 0.0), axis=-1)
    tl = jnp.maximum(pred[..., :2], target[..., :2])
    br = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(br - tl, 0.0)
    union = area_p + area_t - wh[..., 0] * wh[..., 1]
    return iou - (c_area - union) / c_area


def ciou(pred, target, fmt_cxcywh: bool = True, eps: float = 1e-7):
    """Elementwise complete IoU (reference yolov7_loss.py bbox_iou CIoU
    branch, :376-415)."""
    if fmt_cxcywh:
        p = cxcywh2xyxy(pred)
        t = cxcywh2xyxy(target)
    else:
        p, t = pred, target
    iou = elementwise_iou(p, t, fmt_cxcywh=False, eps=eps)
    pw = jnp.maximum(p[..., 2] - p[..., 0], eps)
    ph = jnp.maximum(p[..., 3] - p[..., 1], eps)
    tw = jnp.maximum(t[..., 2] - t[..., 0], eps)
    th = jnp.maximum(t[..., 3] - t[..., 1], eps)
    cw = jnp.maximum(p[..., 2], t[..., 2]) - jnp.minimum(p[..., 0], t[..., 0])
    ch = jnp.maximum(p[..., 3], t[..., 3]) - jnp.minimum(p[..., 1], t[..., 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = (((t[..., 0] + t[..., 2]) - (p[..., 0] + p[..., 2])) ** 2
            + ((t[..., 1] + t[..., 3]) - (p[..., 1] + p[..., 3])) ** 2) / 4.0
    v = (4.0 / jnp.pi**2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = v / jnp.maximum(v - iou + (1.0 + eps), eps)
    # alpha is treated as a constant in torch (computed under no_grad);
    # jax.lax.stop_gradient reproduces that.
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def diou(pred, target, fmt_cxcywh: bool = True, eps: float = 1e-7):
    """Elementwise distance IoU (reference iou_loss.py diou fn, :330-360)."""
    if fmt_cxcywh:
        p = cxcywh2xyxy(pred)
        t = cxcywh2xyxy(target)
    else:
        p, t = pred, target
    iou = elementwise_iou(p, t, fmt_cxcywh=False, eps=eps)
    cw = jnp.maximum(p[..., 2], t[..., 2]) - jnp.minimum(p[..., 0], t[..., 0])
    ch = jnp.maximum(p[..., 3], t[..., 3]) - jnp.minimum(p[..., 1], t[..., 1])
    c2 = cw**2 + ch**2 + eps
    rho2 = (((t[..., 0] + t[..., 2]) - (p[..., 0] + p[..., 2])) ** 2
            + ((t[..., 1] + t[..., 3]) - (p[..., 1] + p[..., 3])) ** 2) / 4.0
    return iou - rho2 / c2


def varifocal_loss(pred_logits, gt_score, label, alpha: float = 0.75,
                   gamma: float = 2.0):
    """Varifocal loss (reference iou_loss.py VarifocalLoss, :53-124):
    IoU-aware classification with asymmetric focal weighting.
    pred_logits/gt_score/label: broadcastable arrays; elementwise."""
    pred = jax.nn.sigmoid(pred_logits)
    weight = alpha * jnp.power(pred, gamma) * (1.0 - label) + gt_score * label
    bce = (jnp.maximum(pred_logits, 0) - pred_logits * gt_score
           + jnp.log1p(jnp.exp(-jnp.abs(pred_logits))))
    return bce * weight


def iou_loss(pred, target, loss_type: str = "giou", fmt_cxcywh: bool = True):
    """IoU losses (reference IOUloss, iou_loss.py:7-50): 'iou' -> 1 - iou^2,
    'giou' -> 1 - giou, 'ciou' -> 1 - ciou. Elementwise, reduction='none'."""
    if loss_type == "iou":
        iou = elementwise_iou(pred, target, fmt_cxcywh=fmt_cxcywh)
        return 1.0 - iou**2
    if loss_type == "giou":
        return 1.0 - jnp.clip(giou(pred, target, fmt_cxcywh=fmt_cxcywh), -1.0, 1.0)
    if loss_type == "ciou":
        return 1.0 - ciou(pred, target, fmt_cxcywh=fmt_cxcywh)
    if loss_type == "diou":
        return 1.0 - diou(pred, target, fmt_cxcywh=fmt_cxcywh)
    raise ValueError(f"Unsupported iou loss type: {loss_type}")


def bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area (reference bbox.py bbox_ioa) — used by
    copypaste / cutpaste / cutout augmentations. box1 [4], box2 [N,4], xyxy."""
    b1 = jnp.asarray(box1)
    b2 = jnp.asarray(box2)
    iw = jnp.clip(jnp.minimum(b1[2], b2[:, 2]) - jnp.maximum(b1[0], b2[:, 0]), 0.0)
    ih = jnp.clip(jnp.minimum(b1[3], b2[:, 3]) - jnp.maximum(b1[1], b2[:, 1]), 0.0)
    inter = iw * ih
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1]) + eps
    return inter / area2
