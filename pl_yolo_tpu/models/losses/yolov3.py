"""YOLOv3 legacy loss + decoder.

Capability parity with reference models/losses/yolov3/yolov3_loss.py:7-157
and yolov3_decoder.py:7-147: per-gt best-anchor assignment at the gt's cell
(wh IoU argmax), noobj mask zeroed where anchor wh-IoU > ignore threshold
(0.5), BCE on sigmoid cx/cy vs in-cell offsets, MSE on raw w/h vs
log(gt/anchor), conf BCE (obj + 0.5*noobj), cls BCE; per-term weights
xy 2.5 / wh 2.5 / conf 1 / cls 1.

TPU re-architecture: the reference's per-image per-gt Python loops
(yolov3_loss.py:64-103) become batched scatters into [na, H, W(+1)] target
grids — a sacrificial column absorbs writes from invalid (padded) gts so
shapes stay fixed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_V3_ANCHORS = (((116, 90), (156, 198), (373, 326)),
                      ((30, 61), (62, 45), (59, 119)),
                      ((10, 13), (16, 30), (33, 23)))


def _wh_iou(gwh: jax.Array, awh: jax.Array) -> jax.Array:
    """IoU of [M,2] gt whs vs [na,2] anchor whs, centered at origin, with the
    reference's +1 inflation (yolov3_loss.py bbox_iou, :142-155)."""
    inter = (jnp.minimum(gwh[:, None, 0], awh[None, :, 0]) + 1.0) * \
            (jnp.minimum(gwh[:, None, 1], awh[None, :, 1]) + 1.0)
    a1 = (gwh[:, 0] + 1.0) * (gwh[:, 1] + 1.0)
    a2 = (awh[:, 0] + 1.0) * (awh[:, 1] + 1.0)
    return inter / (a1[:, None] + a2[None, :] - inter + 1e-16)


def _bce(p, t, eps: float = 1e-7):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def yolov3_loss(
    outputs: Sequence[jax.Array],      # per-level NHWC [B,H,W,na*(5+C)]
    labels: jax.Array,                 # [B, M, 5] cls,cx,cy,w,h pixels
    num_classes: int,
    img_size=(640, 640),
    anchors=DEFAULT_V3_ANCHORS,
    ignore_threshold: float = 0.5,
) -> dict[str, jax.Array]:
    w_xy = w_wh = 2.5
    w_conf = w_cls = 1.0
    gt_valid = jnp.sum(labels, axis=2) > 0
    gt_cls = labels[..., 0].astype(jnp.int32)
    # normalized coords (target2percent, yolov3_loss.py:119-125)
    gt_frac = labels[..., 1:5] / jnp.asarray(
        [img_size[0], img_size[1], img_size[0], img_size[1]], jnp.float32)

    total = 0.0
    for li, level in enumerate(outputs):
        level = level.astype(jnp.float32)
        b, h, w, _ = level.shape
        na = len(anchors[li])
        pred = level.reshape(b, h, w, na, 5 + num_classes)
        pred = pred.transpose(0, 3, 1, 2, 4)            # [B, na, H, W, ch]
        cx = jax.nn.sigmoid(pred[..., 0])
        cy = jax.nn.sigmoid(pred[..., 1])
        pw = pred[..., 2]
        ph = pred[..., 3]
        conf = jax.nn.sigmoid(pred[..., 4])
        cls_p = jax.nn.sigmoid(pred[..., 5:])

        stride_w = img_size[0] / w
        stride_h = img_size[1] / h
        sa = jnp.asarray(anchors[li], jnp.float32) / jnp.asarray(
            [stride_w, stride_h], jnp.float32)          # [na, 2] grid units

        gx = gt_frac[..., 0] * w
        gy = gt_frac[..., 1] * h
        gw = gt_frac[..., 2] * w
        gh = gt_frac[..., 3] * h
        gi = jnp.clip(gx.astype(jnp.int32), 0, w - 1)
        gj = jnp.clip(gy.astype(jnp.int32), 0, h - 1)

        def per_image(gx, gy, gw, gh, gi, gj, cls, valid):
            iou = _wh_iou(jnp.stack([gw, gh], -1), sa)      # [M, na]
            best = jnp.argmax(iou, axis=-1)                 # [M]
            # sacrificial column x=w absorbs invalid writes
            gi_s = jnp.where(valid, gi, w)
            shape = (na, h, w + 1)
            mask = jnp.zeros(shape).at[best, gj, gi_s].set(1.0)
            tx = jnp.zeros(shape).at[best, gj, gi_s].set(gx - gi)
            ty = jnp.zeros(shape).at[best, gj, gi_s].set(gy - gj)
            tw = jnp.zeros(shape).at[best, gj, gi_s].set(
                jnp.log(gw / sa[best, 0] + 1e-16))
            th = jnp.zeros(shape).at[best, gj, gi_s].set(
                jnp.log(gh / sa[best, 1] + 1e-16))
            tcls = jnp.zeros(shape + (num_classes,)).at[best, gj, gi_s].set(
                jax.nn.one_hot(cls, num_classes))
            # noobj: zero every anchor whose wh-IoU with the gt > thr at the
            # gt cell (yolov3_loss.py:87)
            over = (iou > ignore_threshold) & valid[:, None]   # [M, na]
            noobj = jnp.ones(shape)
            anchor_ids = jnp.broadcast_to(
                jnp.arange(na)[None, :], over.shape)
            gj_b = jnp.broadcast_to(gj[:, None], over.shape)
            gi_b = jnp.where(over, jnp.broadcast_to(gi_s[:, None], over.shape), w)
            noobj = noobj.at[anchor_ids.reshape(-1), gj_b.reshape(-1),
                             gi_b.reshape(-1)].min(
                jnp.where(over.reshape(-1), 0.0, 1.0))
            trim = lambda t: t[:, :, :w]
            return (trim(mask), trim(noobj), trim(tx), trim(ty), trim(tw),
                    trim(th), trim(tcls))

        mask, noobj, tx, ty, tw, th, tcls = jax.vmap(per_image)(
            gx, gy, gw, gh, gi, gj, gt_cls, gt_valid)

        loss_x = jnp.mean(_bce(cx * mask, tx * mask))
        loss_y = jnp.mean(_bce(cy * mask, ty * mask))
        loss_w = jnp.mean((pw * mask - tw * mask) ** 2)
        loss_h = jnp.mean((ph * mask - th * mask) ** 2)
        loss_conf = (jnp.mean(_bce(conf * mask, mask))
                     + 0.5 * jnp.mean(_bce(conf * noobj, jnp.zeros_like(noobj))))
        # cls BCE over positive cells only, normalized by their count
        n_pos = jnp.maximum(jnp.sum(mask), 1.0)
        loss_cls = jnp.sum(_bce(cls_p, tcls) * mask[..., None]) / (
            n_pos * num_classes)
        total += (w_xy * (loss_x + loss_y) + w_wh * (loss_w + loss_h)
                  + w_conf * loss_conf + w_cls * loss_cls)
    return {"loss": total}


def yolov3_eval_decode(outputs, strides, anchors, num_classes,
                       img_size=(640, 640)):
    """Decode (yolov3_decoder.py:7-147): xy = (sigmoid+grid)*stride,
    wh = exp(raw)*anchor; obj/cls sigmoid; boxes xyxy."""
    from ...ops.boxes import cxcywh2xyxy
    preds = []
    for li, level in enumerate(outputs):
        level = level.astype(jnp.float32)
        b, h, w, _ = level.shape
        na = len(anchors[li])
        pred = level.reshape(b, h, w, na, 5 + num_classes)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        stride_w = img_size[0] / w
        stride_h = img_size[1] / h
        awh = jnp.asarray(anchors[li], jnp.float32)      # pixels
        x = (jax.nn.sigmoid(pred[..., 0]) + gx[None, :, :, None]) * stride_w
        y = (jax.nn.sigmoid(pred[..., 1]) + gy[None, :, :, None]) * stride_h
        bw = jnp.exp(pred[..., 2]) * awh[None, None, None, :, 0]
        bh = jnp.exp(pred[..., 3]) * awh[None, None, None, :, 1]
        rest = jax.nn.sigmoid(pred[..., 4:])
        flat = jnp.concatenate(
            [jnp.stack([x, y, bw, bh], -1), rest], -1).reshape(
            b, h * w * na, 5 + num_classes)
        boxes = cxcywh2xyxy(flat[..., :4])
        preds.append(jnp.concatenate([boxes, flat[..., 4:]], -1))
    return jnp.concatenate(preds, axis=1)
