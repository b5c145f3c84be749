"""YOLOX loss: grid decode + SimOTA label assignment + GIoU/BCE losses.

Capability parity with reference models/losses/yolox/yolox_loss.py:7-378,
re-architected for TPU:

  * The reference runs a *per-image Python loop* with data-dependent shapes
    (boolean-mask gathers, per-gt sorts; yolox_loss.py:54-139,341-348). Here
    SimOTA is ONE fixed-shape batched computation, vmapped over the batch:
    all [M, A] cost/IoU matrices are dense and masked by validity, so the
    whole loss jit-compiles once and runs on-chip.
  * dynamic-k selection uses lax.top_k over the cost row (k <= 10 because
    dynamic_k = trunc(sum of top-10 IoUs) <= 10) instead of per-gt sorts.
  * The cls BCE cost uses the one-hot decomposition
        sum_c BCE(p_c, onehot_c) = S - log p_cls + log(1 - p_cls),
        S = -sum_c log(1 - p_c)
    turning the reference's [M, A, C] tensor (yolox_loss.py:88-101) into an
    [A, C] pass plus [M, A] gathers.

Grid semantics: anchor a at (row y, col x) of a level has shifts (x, y) and
decodes as xy = (raw_xy + (x, y)) * stride, wh = exp(raw_wh) * stride. This
matches the reference eval decoder (yolox_decoder.py:29, indexing='ij') and
official YOLOX; the reference train-path meshgrid (yolox_loss.py:198,
indexing='xy') is equivalent only for square feature maps — a known
reference bug we do not copy (SURVEY.md §"Known reference bugs").

Eval mode returns [B, A, 5+C] with sigmoid(obj/cls) and xyxy boxes
(yolox_loss.py:25-36).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ...ops.boxes import cxcywh2xyxy, iou_loss, pairwise_iou
from ...ops.topk import topk_lastdim

# Additive penalties for masked-out cost entries. CENTER_PENALTY matches the
# reference's soft penalty for candidates outside box&center (yolox_loss.py:107);
# INVALID_PENALTY excludes non-candidate anchors / invalid gts entirely.
CENTER_PENALTY = 100000.0
INVALID_PENALTY = 1e9


class DecodeOut(NamedTuple):
    preds: jax.Array          # [B, A, 5+C] decoded (cxcywh abs, obj/cls logits)
    ori_boxes: jax.Array      # [B, A, 4] raw reg outputs (for L1 loss)
    x_shifts: jax.Array       # [A]
    y_shifts: jax.Array       # [A]
    strides: jax.Array        # [A]


def yolox_decode(outputs: Sequence[jax.Array], strides: Sequence[int]) -> DecodeOut:
    """Decode per-level NHWC head maps [B,H,W,(5+C)] into flat predictions.

    Mirrors YOLOXLoss.decode (yolox_loss.py:175-228) with 'ij' grid indexing.
    """
    preds, oris, xs, ys, ss = [], [], [], [], []
    for level, stride in zip(outputs, strides):
        level = level.astype(jnp.float32)  # decode/loss math stays fp32
        b, h, w, c = level.shape
        flat = level.reshape(b, h * w, c)
        ori = flat[..., :4]
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flat.dtype),
                              jnp.arange(w, dtype=flat.dtype), indexing="ij")
        gx = gx.reshape(-1)
        gy = gy.reshape(-1)
        xy = (flat[..., :2] + jnp.stack([gx, gy], axis=-1)[None]) * stride
        wh = jnp.exp(flat[..., 2:4]) * stride
        preds.append(jnp.concatenate([xy, wh, flat[..., 4:]], axis=-1))
        oris.append(ori)
        xs.append(gx)
        ys.append(gy)
        ss.append(jnp.full((h * w,), stride, dtype=flat.dtype))
    return DecodeOut(
        preds=jnp.concatenate(preds, axis=1),
        ori_boxes=jnp.concatenate(oris, axis=1),
        x_shifts=jnp.concatenate(xs),
        y_shifts=jnp.concatenate(ys),
        strides=jnp.concatenate(ss),
    )


def yolox_eval_decode(outputs: Sequence[jax.Array], strides: Sequence[int]) -> jax.Array:
    """Eval branch (yolox_loss.py:25-36): sigmoid obj/cls, boxes as xyxy."""
    d = yolox_decode(outputs, strides)
    boxes = cxcywh2xyxy(d.preds[..., :4])
    scores = jax.nn.sigmoid(d.preds[..., 4:])
    return jnp.concatenate([boxes, scores], axis=-1)


def _bce_logits(logits, targets):
    """BCE with logits, elementwise (torch BCEWithLogitsLoss reduction='none')."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


class AssignOut(NamedTuple):
    fg_mask: jax.Array             # [A] bool — anchor is a matched foreground
    matched_gt: jax.Array          # [A] int32 — index of matched gt (valid where fg)
    pred_ious: jax.Array           # [A] IoU with matched gt
    num_fg: jax.Array              # [] float
    num_gt: jax.Array              # [] float


def simota_assign(
    gt_boxes: jax.Array,      # [M, 4] cxcywh (abs pixels)
    gt_classes: jax.Array,    # [M] int32
    gt_valid: jax.Array,      # [M] bool
    pred_boxes: jax.Array,    # [A, 4] cxcywh decoded
    obj_logits: jax.Array,    # [A]
    cls_logits: jax.Array,    # [A, C]
    x_shifts: jax.Array,      # [A]
    y_shifts: jax.Array,      # [A]
    strides: jax.Array,       # [A]
    center_radius: float = 2.5,
    chunk: int | None = None,
) -> AssignOut:
    """SimOTA for ONE image, fully fixed-shape (vmap over batch).

    Reference: get_in_boxes_info (yolox_loss.py:231-315), cost build
    (:84-108), dynamic_k_matching (:318-370).

    `chunk`: optional label-axis chunking (`_simota_assign_chunked`) — same
    outputs, [chunk, A] peak temporaries instead of [M, A]. The [M, A] cost
    build is the largest HBM temporary of the whole train step at big batch
    (PERF.md: f32[B,100,8400,2] = 1.68 GiB at B256).
    """
    if chunk is not None and chunk < gt_boxes.shape[0]:
        return _simota_assign_chunked(
            gt_boxes, gt_classes, gt_valid, pred_boxes, obj_logits,
            cls_logits, x_shifts, y_shifts, strides, center_radius, chunk)
    num_classes = cls_logits.shape[-1]
    xc = (x_shifts + 0.5) * strides                      # [A] anchor centers
    yc = (y_shifts + 0.5) * strides

    gx, gy, gw, gh = (gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2], gt_boxes[:, 3])
    # in-box test (yolox_loss.py:249-281)
    l = xc[None, :] - (gx - 0.5 * gw)[:, None]
    r = (gx + 0.5 * gw)[:, None] - xc[None, :]
    t = yc[None, :] - (gy - 0.5 * gh)[:, None]
    b = (gy + 0.5 * gh)[:, None] - yc[None, :]
    is_in_box = (jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.0)
    # in-center test, radius 2.5 strides (yolox_loss.py:284-307)
    rad = center_radius * strides[None, :]
    cl = xc[None, :] - (gx[:, None] - rad)
    cr = (gx[:, None] + rad) - xc[None, :]
    ct = yc[None, :] - (gy[:, None] - rad)
    cb = (gy[:, None] + rad) - yc[None, :]
    is_in_center = (jnp.minimum(jnp.minimum(cl, cr), jnp.minimum(ct, cb)) > 0.0)

    valid = gt_valid[:, None]
    is_in_box = is_in_box & valid
    is_in_center = is_in_center & valid
    fg_cand = jnp.any(is_in_box | is_in_center, axis=0)       # [A]
    in_box_and_center = is_in_box & is_in_center              # [M, A]

    # pairwise IoU (stop-grad; the assignment is not differentiated, :68)
    pair_iou = pairwise_iou(cxcywh2xyxy(gt_boxes), cxcywh2xyxy(pred_boxes))
    pair_iou = jnp.where(valid & fg_cand[None, :], pair_iou, 0.0)
    iou_cost = -jnp.log(pair_iou + 1e-8)

    # cls cost via one-hot BCE decomposition (see module docstring)
    p = jnp.sqrt(jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None])
    p = jnp.clip(p, 1e-8, 1.0 - 1e-8)                         # [A, C]
    log_p = jnp.log(p)
    log_1mp = jnp.log1p(-p)
    s_all = -jnp.sum(log_1mp, axis=-1)                        # [A]
    cls_idx = jnp.clip(gt_classes, 0, num_classes - 1)
    # per-gt class column as a one-hot matmul (TPU: MXU beats gather)
    onehot_cls = jax.nn.one_hot(cls_idx, num_classes)         # [M, C]
    sel_log_p = onehot_cls @ log_p.T                          # [M, A]
    sel_log_1mp = onehot_cls @ log_1mp.T
    cls_cost = s_all[None, :] - sel_log_p + sel_log_1mp

    cost = (cls_cost + 3.0 * iou_cost
            + CENTER_PENALTY * (~in_box_and_center)
            + INVALID_PENALTY * (~(valid & fg_cand[None, :])))

    # dynamic-k (yolox_loss.py:336-340): k = clamp(trunc(sum top-10 IoU), 1)
    topk_iou = topk_lastdim(pair_iou, min(10, pair_iou.shape[-1]))
    dynamic_k = jnp.clip(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1, 10)

    # match the k cheapest anchors per gt: threshold at the k-th smallest cost
    neg_top = topk_lastdim(-cost, 10)                         # [M, 10] (k <= 10)
    kth_cost = -jnp.take_along_axis(neg_top, dynamic_k[:, None] - 1, axis=1)[:, 0]
    matching = (cost <= kth_cost[:, None]) & valid & fg_cand[None, :]

    # conflict resolution (yolox_loss.py:352-356): anchors claimed by >1 gt
    # are FORCE-assigned to the argmin-cost gt (reference zeroes the column
    # then sets matching[cost_argmin]=1 — even if that gt's dynamic-k
    # threshold had not claimed the anchor)
    n_claims = jnp.sum(matching, axis=0)                      # [A]
    argmin_gt = jnp.argmin(cost, axis=0)                      # [A]
    only_min = (jax.nn.one_hot(argmin_gt, gt_boxes.shape[0], dtype=bool).T
                & valid & fg_cand[None, :])
    matching = jnp.where(n_claims[None, :] > 1, only_min, matching)

    fg_mask = jnp.any(matching, axis=0)
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
    pred_ious = jnp.sum(jnp.where(matching, pair_iou, 0.0), axis=0)
    return AssignOut(
        fg_mask=fg_mask,
        matched_gt=matched_gt,
        pred_ious=pred_ious,
        num_fg=jnp.sum(fg_mask).astype(jnp.float32),
        num_gt=jnp.sum(gt_valid).astype(jnp.float32),
    )


def _simota_assign_chunked(
    gt_boxes, gt_classes, gt_valid, pred_boxes, obj_logits, cls_logits,
    x_shifts, y_shifts, strides, center_radius, chunk: int,
) -> AssignOut:
    """Label-axis-chunked SimOTA: identical outputs to the dense path.

    A `lax.scan` over ceil(M/chunk) gt chunks carries per-ANCHOR
    accumulators; nothing [M, A]-shaped is ever live:

      * n_claims[A]   — how many gts' dynamic-k sets claimed the anchor;
      * sum_row[A]    — sum of claiming row indices (for n_claims == 1 this
                        IS the matched row, replicating argmax-first-True);
      * sum_iou[A]    — sum of claiming rows' IoU (ditto);
      * running (min_cost, argmin_row, iou_at_min)[A] — strict-< update so
        the FIRST minimum wins across chunks, replicating jnp.argmin.

    The dense path's conflict resolution (yolox_loss.py:352-356: anchors
    claimed by >1 gts are force-assigned to the argmin-cost gt) then reduces
    to a per-anchor select between the two accumulator families. Rows of a
    conflict-free anchor and the argmin of a conflicted one coincide with
    the dense path's, so outputs are bit-identical up to fp reduction order
    (tests/test_simota_chunk.py asserts exact equality on random problems).

    All chunk math (cost, dynamic-k, matching) sits under the caller's
    stop_gradient, so the scan adds no backward buffers.
    """
    num_classes = cls_logits.shape[-1]
    a = pred_boxes.shape[0]
    m = gt_boxes.shape[0]
    pad = (-m) % chunk
    if pad:  # pad with invalid gts — masked out of every term below
        gt_boxes = jnp.concatenate(
            [gt_boxes, jnp.zeros((pad, 4), gt_boxes.dtype)])
        gt_classes = jnp.concatenate(
            [gt_classes, jnp.zeros((pad,), gt_classes.dtype)])
        gt_valid = jnp.concatenate([gt_valid, jnp.zeros((pad,), bool)])
    n_chunks = (m + pad) // chunk

    xc = (x_shifts + 0.5) * strides
    yc = (y_shifts + 0.5) * strides
    pred_xyxy = cxcywh2xyxy(pred_boxes)

    # per-anchor cls-cost ingredients (see module docstring), [A, C] / [A]
    p = jnp.sqrt(jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None])
    p = jnp.clip(p, 1e-8, 1.0 - 1e-8)
    log_p = jnp.log(p)
    log_1mp = jnp.log1p(-p)
    s_all = -jnp.sum(log_1mp, axis=-1)

    as_chunks = lambda x: x.reshape(n_chunks, chunk, *x.shape[1:])
    gtb, gtc, gtv = as_chunks(gt_boxes), as_chunks(gt_classes), as_chunks(gt_valid)
    row0s = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def geometry(boxes, valid):
        gx, gy, gw, gh = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        l = xc[None, :] - (gx - 0.5 * gw)[:, None]
        r = (gx + 0.5 * gw)[:, None] - xc[None, :]
        t = yc[None, :] - (gy - 0.5 * gh)[:, None]
        b = (gy + 0.5 * gh)[:, None] - yc[None, :]
        in_box = (jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.0)
        rad = center_radius * strides[None, :]
        cl = xc[None, :] - (gx[:, None] - rad)
        cr = (gx[:, None] + rad) - xc[None, :]
        ct = yc[None, :] - (gy[:, None] - rad)
        cb = (gy[:, None] + rad) - yc[None, :]
        in_center = (jnp.minimum(jnp.minimum(cl, cr), jnp.minimum(ct, cb)) > 0.0)
        v = valid[:, None]
        return in_box & v, in_center & v

    def fg_step(acc, xs):
        boxes, valid = xs
        in_box, in_center = geometry(boxes, valid)
        return acc | jnp.any(in_box | in_center, axis=0), None

    fg_cand, _ = jax.lax.scan(fg_step, jnp.zeros((a,), bool), (gtb, gtv))

    def step(carry, xs):
        n_claims, sum_row, sum_iou, min_cost, argmin_row, iou_at_min = carry
        boxes, classes, valid, row0 = xs
        in_box, in_center = geometry(boxes, valid)
        vmask = valid[:, None] & fg_cand[None, :]
        pair = pairwise_iou(cxcywh2xyxy(boxes), pred_xyxy)
        pair = jnp.where(vmask, pair, 0.0)
        iou_cost = -jnp.log(pair + 1e-8)
        onehot_cls = jax.nn.one_hot(
            jnp.clip(classes, 0, num_classes - 1), num_classes)
        cls_cost = s_all[None, :] - onehot_cls @ log_p.T + onehot_cls @ log_1mp.T
        cost = (cls_cost + 3.0 * iou_cost
                + CENTER_PENALTY * (~(in_box & in_center))
                + INVALID_PENALTY * (~vmask))

        topk_iou = topk_lastdim(pair, min(10, a))
        dynamic_k = jnp.clip(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1, 10)
        neg_top = topk_lastdim(-cost, 10)
        kth_cost = -jnp.take_along_axis(
            neg_top, dynamic_k[:, None] - 1, axis=1)[:, 0]
        matching = (cost <= kth_cost[:, None]) & vmask

        rows = row0 + jnp.arange(chunk, dtype=jnp.int32)
        n_claims = n_claims + jnp.sum(matching, axis=0, dtype=jnp.int32)
        sum_row = sum_row + jnp.sum(
            jnp.where(matching, rows[:, None], 0), axis=0, dtype=jnp.int32)
        sum_iou = sum_iou + jnp.sum(jnp.where(matching, pair, 0.0), axis=0)

        chunk_min = jnp.min(cost, axis=0)
        chunk_arg = jnp.argmin(cost, axis=0).astype(jnp.int32)
        # IoU at the chunk argmin row, as a one-hot contraction (chunk is
        # small; per-anchor axis-0 gathers are slow on TPU)
        chunk_iou = jnp.sum(
            pair * jax.nn.one_hot(chunk_arg, chunk, dtype=pair.dtype, axis=0),
            axis=0)
        upd = chunk_min < min_cost          # strict: first minimum wins
        min_cost = jnp.where(upd, chunk_min, min_cost)
        argmin_row = jnp.where(upd, row0 + chunk_arg, argmin_row)
        iou_at_min = jnp.where(upd, chunk_iou, iou_at_min)
        return (n_claims, sum_row, sum_iou, min_cost, argmin_row, iou_at_min), None

    init = (jnp.zeros((a,), jnp.int32), jnp.zeros((a,), jnp.int32),
            jnp.zeros((a,), jnp.float32), jnp.full((a,), jnp.inf, jnp.float32),
            jnp.zeros((a,), jnp.int32), jnp.zeros((a,), jnp.float32))
    (n_claims, sum_row, sum_iou, min_cost, argmin_row, iou_at_min), _ = (
        jax.lax.scan(step, init, (gtb, gtc, gtv, row0s)))

    multi = n_claims > 1
    fg_mask = n_claims >= 1
    matched_gt = jnp.where(multi, argmin_row, sum_row)
    pred_ious = jnp.where(multi, iou_at_min, sum_iou)
    return AssignOut(
        fg_mask=fg_mask,
        matched_gt=matched_gt,
        pred_ious=pred_ious,
        num_fg=jnp.sum(fg_mask).astype(jnp.float32),
        num_gt=jnp.sum(gt_valid).astype(jnp.float32),
    )


def yolox_loss(
    outputs: Sequence[jax.Array],   # per-level NHWC head maps
    labels: jax.Array,              # [B, max_labels, 5] = [cls, cx, cy, w, h]
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    use_l1: bool = False,
    assign_chunk: int | None = None,
    pallas_assign: bool = False,
) -> dict[str, jax.Array]:
    """Training loss (yolox_loss.py:38-173): GIoU*5 + obj BCE + cls BCE (+L1),
    normalized by total foreground count across the batch."""
    d = yolox_decode(outputs, strides)
    preds = d.preds
    bbox_preds = preds[..., :4]
    obj_logits = preds[..., 4]
    cls_logits = preds[..., 5:]

    gt_valid = jnp.sum(labels, axis=2) > 0                    # (yolox_loss.py:43)
    gt_classes = labels[..., 0].astype(jnp.int32)
    gt_boxes = labels[..., 1:5]

    # NOTE on `pallas_assign` (loss: {pallas_assign: true}): the fully-
    # fused Pallas assignment (ops/pallas/simota_pallas.py: the whole
    # [M, A] cost/top-k/matching pipeline per image in VMEM) measures
    # 15.7 ms standalone at B128/M100/A8400 — but IN the train step it
    # regressed the bench 504.7 -> 298.6 img/s in r2, and the r5 revisit
    # under the tuned scoped-vmem + latency-hiding flags reproduced it
    # exactly (520.5 -> 297.7 img/s median of 3 interleaved trials,
    # tools/perf_fused_simota.py): the opaque custom call serializes
    # against the conv backward regardless of in-kernel pipelining. It
    # ships OFF (PERF.md round-5 section). The jnp path with the Pallas
    # top-k (ops/pallas/topk_pallas.py) is the production path.
    sg = jax.lax.stop_gradient
    if pallas_assign:
        from ...ops.pallas.simota_pallas import simota_assign_pallas
        fg_p, matched_p, piou_p = simota_assign_pallas(
            sg(gt_boxes), gt_classes, gt_valid, sg(bbox_preds),
            sg(obj_logits), sg(cls_logits),
            d.x_shifts, d.y_shifts, d.strides,
            interpret=jax.default_backend() != "tpu")
        assign = AssignOut(
            fg_mask=fg_p, matched_gt=matched_p, pred_ious=piou_p,
            num_fg=jnp.sum(fg_p, axis=1).astype(jnp.float32),
            num_gt=jnp.sum(gt_valid, axis=1).astype(jnp.float32))
    else:
        assign = jax.vmap(
            functools.partial(simota_assign, chunk=assign_chunk),
            in_axes=(0, 0, 0, 0, 0, 0, None, None, None),
        )(
            sg(gt_boxes), gt_classes, gt_valid, sg(bbox_preds),
            sg(obj_logits), sg(cls_logits),
            d.x_shifts, d.y_shifts, d.strides,
        )

    fg = assign.fg_mask.astype(jnp.float32)                   # [B, A]
    num_fgs = jnp.maximum(jnp.sum(assign.num_fg), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign.num_gt), 1.0)

    # targets per anchor via one-hot matmuls (TPU: MXU beats [B,A] gathers)
    m = gt_boxes.shape[1]
    match_onehot = jax.nn.one_hot(assign.matched_gt, m)       # [B, A, M]
    reg_targets = jnp.einsum("bam,bmc->bac", match_onehot, gt_boxes)

    loss_iou = jnp.sum(iou_loss(bbox_preds, reg_targets, "giou") * fg) / num_fgs
    loss_obj = jnp.sum(_bce_logits(obj_logits, fg)) / num_fgs

    # cls BCE with targets onehot(cls)*iou (yolox_loss.py:123-125,154),
    # decomposed so the [B, A, C] target tensor never materializes:
    #   sum_c BCE(l_c, t_c) = sum_c [max(l_c,0) + log1p(exp(-|l_c|))]
    #                         - iou * l_{matched class}
    # (identical value AND gradient: d/dl = sigmoid(l) - t elementwise).
    # l_{matched class} comes from two small matmuls instead of gathers.
    s1 = jnp.sum(jnp.maximum(cls_logits, 0)
                 + jnp.log1p(jnp.exp(-jnp.abs(cls_logits))), axis=-1)  # [B, A]
    gt_cls_onehot = jax.nn.one_hot(gt_classes, num_classes)   # [B, M, C]
    per_gt_logit = jnp.einsum("bmc,bac->bma", gt_cls_onehot, cls_logits)
    l_sel = jnp.einsum("bam,bma->ba", match_onehot, per_gt_logit)
    loss_cls = jnp.sum((s1 - assign.pred_ious * l_sel) * fg) / num_fgs

    # use_l1 may be a static bool (compiled in/out) or a traced scalar for
    # the epoch-gated no-aug schedule (one compiled step, flag flips live)
    if isinstance(use_l1, bool) and not use_l1:
        loss_l1 = jnp.asarray(0.0)
    else:
        # L1 in grid units (yolox_loss.py:373-378)
        st = d.strides[None, :]
        l1_t = jnp.stack([
            reg_targets[..., 0] / st - d.x_shifts[None, :],
            reg_targets[..., 1] / st - d.y_shifts[None, :],
            jnp.log(reg_targets[..., 2] / st + 1e-8),
            jnp.log(reg_targets[..., 3] / st + 1e-8),
        ], axis=-1)
        loss_l1 = jnp.sum(
            jnp.sum(jnp.abs(d.ori_boxes - l1_t), axis=-1) * fg) / num_fgs
        if not isinstance(use_l1, bool):
            loss_l1 = loss_l1 * jnp.asarray(use_l1, jnp.float32)

    reg_weight = 5.0                                          # (yolox_loss.py:162)
    loss = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "loss": loss,
        "loss_iou": loss_iou,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        "loss_l1": loss_l1,
        "proportion": jnp.sum(assign.num_fg) / num_gts,
    }
