"""Pallas TPU kernel: the whole per-image SimOTA assignment in VMEM.

The jnp path (models/losses/yolox.py::simota_assign) materializes ~6
[B, M, A] f32 tensors in HBM (~430 MB each at B128/M100/A8400) and runs two
k-pass top-k sweeps over them — ~25 ms of the 29 ms loss forward. This
kernel computes everything for one image in a single grid step with the
[M', A'] working set resident in VMEM (~3.5 MB per f32 tensor): in-box /
in-center gates, pairwise IoU, the cls/obj BCE cost (via one-hot MXU
matmuls against the C-padded logits, bf16 operands exactly like the jnp
dot's default TPU precision), dynamic-k from the top-10 IoU sum, the
k-th-smallest cost threshold, matching with the reference's force-assign
conflict resolution, and the fg/matched/pred-iou outputs.

Padding semantics (proved assignment-invariant):
 * anchors pad A -> A' (128-multiple): avalid=0 forces fg_cand false and an
   INVALID-scale cost; dynamic-k <= #candidates always (sum of <=1 IoUs),
   so padded entries can never become the k-th threshold of a row that has
   any candidate, and candidate-free rows match nothing either way.
 * classes pad C -> 128 with -1e9 logits: sigmoid -> 0 -> p clipped to 1e-8
   adds the same ~1e-8 per padded channel to EVERY anchor's s_all — a
   uniform cost shift that cancels in thresholds/argmins.
 * gts pad M -> M' (8-multiple) with valid=0 -> INVALID rows.

Top-k runs as distinct-value extraction (ops/pallas/topk_pallas.py scheme):
per pass one lane-max + one tie-count; the top-10 IoU SUM takes
min(count, space) copies of each value, and the k-th smallest cost is the
pass value whose cumulative count first covers dynamic_k.

Exactness vs the jnp path: identical formulas in f32; the only divergence
sources are transcendental ulps (log/sigmoid/sqrt lowering) feeding the
bf16-rounded matmul operands — assignment flips require costs within ~1e-3
of a threshold tie (see tests/test_simota_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CENTER_PENALTY = 100000.0
INVALID_PENALTY = 1e9
_BIG = 1e9


def _simota_kernel(gx_ref, gy_ref, gw_ref, gh_ref, gcls_ref, gvalid_ref,
                   px_ref, obj_col_ref, cls_ref, xc_ref, yc_ref,
                   rad_ref, avalid_ref, fg_ref, matched_ref, piou_ref,
                   *, num_classes: int, center_radius: float):
    gx = gx_ref[0]                                         # (M', 1)
    gy = gy_ref[0]
    gw = gw_ref[0]
    gh = gh_ref[0]
    gvalid = gvalid_ref[0] > 0.0                           # (M', 1) bool
    xc = xc_ref[0]                                         # (1, A')
    yc = yc_ref[0]
    rad = rad_ref[0]
    avalid = avalid_ref[0] > 0.0                           # (1, A') bool
    mp = gx.shape[0]
    ap = xc.shape[1]

    # in-box / in-center gates (yolox_loss.py:249-307)
    l = xc - (gx - 0.5 * gw)
    r = (gx + 0.5 * gw) - xc
    t = yc - (gy - 0.5 * gh)
    b = (gy + 0.5 * gh) - yc
    in_box = (jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0.0)
    cl = xc - (gx - rad)
    cr = (gx + rad) - xc
    ct = yc - (gy - rad)
    cb = (gy + rad) - yc
    in_center = (jnp.minimum(jnp.minimum(cl, cr), jnp.minimum(ct, cb)) > 0.0)
    in_box = in_box & gvalid
    in_center = in_center & gvalid
    fg_cand = jnp.any(in_box | in_center, axis=0, keepdims=True) & avalid
    in_both = in_box & in_center

    # pairwise IoU (ops/boxes.py::pairwise_iou on cxcywh->xyxy)
    pcx = px_ref[0, 0:1]                                   # (1, A')
    pcy = px_ref[0, 1:2]
    pw = px_ref[0, 2:3]
    ph = px_ref[0, 3:4]
    tlx = jnp.maximum(gx - 0.5 * gw, pcx - 0.5 * pw)
    tly = jnp.maximum(gy - 0.5 * gh, pcy - 0.5 * ph)
    brx = jnp.minimum(gx + 0.5 * gw, pcx + 0.5 * pw)
    bry = jnp.minimum(gy + 0.5 * gh, pcy + 0.5 * ph)
    inter = jnp.clip(brx - tlx, 0.0) * jnp.clip(bry - tly, 0.0)
    area_g = jnp.clip(gw, 0.0) * jnp.clip(gh, 0.0)
    area_p = jnp.clip(pw, 0.0) * jnp.clip(ph, 0.0)
    iou = inter / jnp.maximum(area_g + area_p - inter, 1e-12)
    pair_iou = jnp.where(gvalid & fg_cand, iou, 0.0)       # (M', A')
    iou_cost = -jnp.log(pair_iou + 1e-8)

    # cls cost: p = sqrt(sig(cls) * sig(obj)); sel columns via one-hot MXU
    # matmuls against the (A', C) logit block (bf16 operands = the jnp
    # dot's default TPU precision)
    cls = cls_ref[0]                                       # (A', C)
    obj = obj_col_ref[0]                                   # (A', 1)
    p = jnp.sqrt(jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj))
    p = jnp.clip(p, 1e-8, 1.0 - 1e-8)
    log_p = jnp.log(p).astype(jnp.bfloat16)                # (A', C)
    log_1mp = jnp.log1p(-p).astype(jnp.bfloat16)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (mp, cls.shape[1]), 1)
    cls_idx = jnp.clip(gcls_ref[0].astype(jnp.int32), 0, num_classes - 1)
    onehot = (c_iota == cls_idx).astype(jnp.bfloat16)      # (M', C)
    dims = (((1,), (1,)), ((), ()))                        # contract C
    # cls_cost[m,a] = -sum_c l1[a,c] - lp[a,cls_m] + l1[a,cls_m]
    #              = onehot @ (l1 - lp)^T  -  ones @ l1^T
    # the background term is a (1, C) x (A', C) MXU row — no transposes,
    # and s_all never exists outside VMEM
    sel_diff = jax.lax.dot_general(onehot, log_1mp - log_p, dims,
                                   preferred_element_type=jnp.float32)
    ones_row = jnp.ones((1, cls.shape[1]), jnp.bfloat16)
    s_row = jax.lax.dot_general(ones_row, log_1mp, dims,
                                preferred_element_type=jnp.float32)
    cls_cost = sel_diff - s_row                            # (M', A')

    cand = gvalid & fg_cand
    cost = (cls_cost + 3.0 * iou_cost
            + CENTER_PENALTY * (~in_both)
            + INVALID_PENALTY * (~cand))

    # dynamic-k: sum of top-10 IoUs, then the dynamic_k-th smallest cost —
    # both by distinct-value extraction (one lane-max + one tie-count/pass)
    cur = pair_iou
    filled = jnp.zeros((mp, 1), jnp.int32)
    top_sum = jnp.zeros((mp, 1), jnp.float32)
    for _ in range(10):
        m = jnp.max(cur, axis=1, keepdims=True)
        tie = cur == m
        cnt = jnp.sum(tie.astype(jnp.int32), axis=1, keepdims=True)
        take = jnp.clip(10 - filled, 0, None)
        take = jnp.minimum(cnt, take)
        top_sum = top_sum + m * take.astype(jnp.float32)
        filled = filled + cnt
        cur = jnp.where(tie, -jnp.inf, cur)
    dynamic_k = jnp.clip(top_sum.astype(jnp.int32), 1, 10)  # (M', 1)

    neg = -cost
    filled = jnp.zeros((mp, 1), jnp.int32)
    kth_cost = jnp.full((mp, 1), _BIG, jnp.float32)
    for _ in range(10):
        m = jnp.max(neg, axis=1, keepdims=True)
        tie = neg == m
        cnt = jnp.sum(tie.astype(jnp.int32), axis=1, keepdims=True)
        hit = (dynamic_k > filled) & (dynamic_k <= filled + cnt)
        kth_cost = jnp.where(hit, -m, kth_cost)
        filled = filled + cnt
        neg = jnp.where(tie, -jnp.inf, neg)

    matching = (cost <= kth_cost) & cand                   # (M', A')

    # conflict resolution: multiply-claimed anchors force-assigned to their
    # argmin-cost gt (first index on ties, like jnp.argmin)
    n_claims = jnp.sum(matching.astype(jnp.int32), axis=0, keepdims=True)
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (mp, ap), 0)
    minc = jnp.min(cost, axis=0, keepdims=True)            # (1, A')
    argmin_gt = jnp.min(jnp.where(cost == minc, m_iota, mp), axis=0,
                        keepdims=True)                     # (1, A')
    only_min = (m_iota == argmin_gt) & cand
    # bool-vector select fails Mosaic legalization (i8->i1 trunc); select
    # in int32 instead
    matching = jnp.where(n_claims > 1, only_min.astype(jnp.int32),
                         matching.astype(jnp.int32)) == 1

    fg = jnp.any(matching, axis=0, keepdims=True)          # (1, A')
    first_m = jnp.min(jnp.where(matching, m_iota, mp), axis=0, keepdims=True)
    matched = jnp.where(fg, first_m, 0)
    piou = jnp.sum(jnp.where(matching, pair_iou, 0.0), axis=0, keepdims=True)

    fg_ref[0] = fg.astype(jnp.float32)
    matched_ref[0] = matched.astype(jnp.int32)
    piou_ref[0] = piou


def simota_assign_pallas(gt_boxes, gt_classes, gt_valid, pred_boxes,
                         obj_logits, cls_logits, x_shifts, y_shifts,
                         strides, center_radius: float = 2.5,
                         interpret: bool = False):
    """Batched SimOTA assignment. Shapes as the vmapped jnp path:
    gt_boxes [B,M,4] cxcywh, gt_classes [B,M] int, gt_valid [B,M] bool,
    pred_boxes [B,A,4], obj_logits [B,A], cls_logits [B,A,C],
    x/y_shifts/strides [A]. Returns (fg_mask [B,A] bool, matched_gt [B,A]
    i32, pred_ious [B,A] f32)."""
    b, m, _ = gt_boxes.shape
    a = pred_boxes.shape[1]
    c = cls_logits.shape[-1]
    mp = -(-m // 8) * 8
    ap = -(-a // 128) * 128
    cp = -(-c // 128) * 128

    def padm(x, val=0.0):
        return jnp.pad(x, ((0, 0), (0, mp - m)) + ((0, 0),) * (x.ndim - 2),
                       constant_values=val)

    gxyzw = padm(gt_boxes.astype(jnp.float32))             # [B, M', 4]
    gcls = padm(gt_classes.astype(jnp.float32))
    gval = padm(gt_valid.astype(jnp.float32))
    preds = jnp.pad(pred_boxes.astype(jnp.float32),
                    ((0, 0), (0, ap - a), (0, 0)))
    preds_t = preds.transpose(0, 2, 1)                     # [B, 4, A']
    obj = jnp.pad(obj_logits.astype(jnp.float32),
                  ((0, 0), (0, ap - a)), constant_values=-1e9)
    cls = jnp.pad(cls_logits.astype(jnp.float32),
                  ((0, 0), (0, ap - a), (0, cp - c)), constant_values=-1e9)

    xs = jnp.pad(x_shifts.astype(jnp.float32), (0, ap - a))
    ys = jnp.pad(y_shifts.astype(jnp.float32), (0, ap - a))
    st = jnp.pad(strides.astype(jnp.float32), (0, ap - a))
    xc = ((xs + 0.5) * st)[None, None, :]                  # [1, 1, A']
    yc = ((ys + 0.5) * st)[None, None, :]
    rad = (center_radius * st)[None, None, :]
    avalid = (jnp.arange(ap) < a).astype(jnp.float32)[None, None, :]

    col = pl.BlockSpec((1, mp, 1), lambda i: (i, 0, 0))
    row = pl.BlockSpec((1, 1, ap), lambda i: (i, 0, 0))
    shared_row = pl.BlockSpec((1, 1, ap), lambda i: (0, 0, 0))
    kern = functools.partial(_simota_kernel, num_classes=c,
                             center_radius=center_radius)
    fg, matched, piou = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            col, col, col, col, col, col,                  # gx gy gw gh cls v
            pl.BlockSpec((1, 4, ap), lambda i: (i, 0, 0)),  # preds (4, A')
            pl.BlockSpec((1, ap, 1), lambda i: (i, 0, 0)),  # obj column
            pl.BlockSpec((1, ap, cp), lambda i: (i, 0, 0)),  # cls (A', C)
            shared_row, shared_row, shared_row, shared_row,  # xc yc rad av
        ],
        out_specs=[row, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, ap), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gxyzw[..., 0:1], gxyzw[..., 1:2], gxyzw[..., 2:3], gxyzw[..., 3:4],
      gcls[..., None], gval[..., None], preds_t, obj[..., None], cls,
      xc, yc, rad, avalid)
    return (fg[:, 0, :a] > 0.5, matched[:, 0, :a], piou[:, 0, :a])
