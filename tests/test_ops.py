"""Tests for decode / NMS / SimOTA against numpy oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.models.losses.yolox import (
    simota_assign, yolox_decode, yolox_eval_decode, yolox_loss,
)
from pl_yolo_tpu.ops.boxes import cxcywh2xyxy, pairwise_iou, xyxy2cxcywh
from pl_yolo_tpu.ops.nms import batched_nms, postprocess

from oracles import np_greedy_nms, np_pairwise_iou, np_simota


# ---------------------------------------------------------------- box utils

def test_box_roundtrip(rng):
    boxes = rng.uniform(0, 100, size=(17, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:])
    back = np.asarray(cxcywh2xyxy(xyxy2cxcywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-4)


def test_pairwise_iou_matches_numpy(rng):
    a = rng.uniform(0, 50, size=(5, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 30, size=(5, 2))
    b = rng.uniform(0, 50, size=(7, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(1, 30, size=(7, 2))
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_pairwise_iou(a, b), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------ decode

def test_decode_grid_math():
    # one 2x3 level at stride 8, zero reg outputs -> centers at grid*8, wh=8
    c = 5 + 2
    level = np.zeros((1, 2, 3, c), dtype=np.float32)
    d = yolox_decode([jnp.asarray(level)], strides=[8])
    preds = np.asarray(d.preds)[0]
    assert preds.shape == (6, c)
    # anchor order row-major: a = y*w + x
    want_xy = np.array([[x * 8, y * 8] for y in range(2) for x in range(3)], np.float32)
    np.testing.assert_allclose(preds[:, :2], want_xy)
    np.testing.assert_allclose(preds[:, 2:4], 8.0)  # exp(0)*8
    np.testing.assert_array_equal(np.asarray(d.x_shifts), [0, 1, 2, 0, 1, 2])
    np.testing.assert_array_equal(np.asarray(d.y_shifts), [0, 0, 0, 1, 1, 1])


def test_eval_decode_sigmoid_and_xyxy():
    level = np.random.default_rng(3).normal(size=(2, 4, 4, 85)).astype(np.float32)
    out = np.asarray(yolox_eval_decode([jnp.asarray(level)], strides=[8]))
    assert out.shape == (2, 16, 85)
    assert (out[..., 4:] >= 0).all() and (out[..., 4:] <= 1).all()
    # x2 > x1 where w > 0 (always, since wh = exp(.)*stride > 0)
    assert (out[..., 2] > out[..., 0]).all()
    assert (out[..., 3] > out[..., 1]).all()


# --------------------------------------------------------------------- NMS

@pytest.mark.parametrize("class_agnostic", [True, False])
def test_nms_matches_greedy_oracle(rng, class_agnostic):
    n, c = 200, 5
    boxes = rng.uniform(0, 80, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 40, size=(n, 2))
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    classes = rng.integers(0, c, size=(n,)).astype(np.int32)

    det = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None],
        conf_threshold=0.05, iou_threshold=0.5, max_det=100, pre_nms_topk=256,
        class_agnostic=class_agnostic,
    )
    got_idx_scores = np.asarray(det.scores[0])[np.asarray(det.valid[0])]

    keep_scores = scores[scores >= 0.05]
    keep_boxes = boxes[scores >= 0.05]
    keep_classes = classes[scores >= 0.05]
    if class_agnostic:
        nms_boxes = keep_boxes
    else:
        nms_boxes = keep_boxes + (keep_classes[:, None] * 4096.0)
    keep = np_greedy_nms(nms_boxes, keep_scores, 0.5)
    want_scores = np.sort(keep_scores[keep])[::-1][:100]
    np.testing.assert_allclose(np.sort(got_idx_scores)[::-1], want_scores, rtol=1e-6)


def test_postprocess_shapes(rng):
    preds = rng.uniform(0, 1, size=(2, 400, 85)).astype(np.float32)
    preds[..., :4] *= 600
    preds[..., 2:4] += preds[..., 0:2]  # make xyxy-ish
    det = postprocess(jnp.asarray(preds), conf_threshold=0.3,
                      iou_threshold=0.5, max_det=30, pre_nms_topk=64)
    assert det.boxes.shape == (2, 30, 4)
    assert det.scores.shape == (2, 30)
    assert det.valid.dtype == jnp.bool_


# ------------------------------------------------------------------ SimOTA

def _random_assignment_case(rng, num_gt, grid=(8, 8), stride=8, C=7):
    h, w = grid
    A = h * w
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    x_shifts = gx.reshape(-1).astype(np.float32)
    y_shifts = gy.reshape(-1).astype(np.float32)
    strides = np.full(A, stride, np.float32)
    size = h * stride
    gt = np.zeros((num_gt, 4), np.float32)
    gt[:, 0] = rng.uniform(8, size - 8, num_gt)
    gt[:, 1] = rng.uniform(8, size - 8, num_gt)
    gt[:, 2] = rng.uniform(6, size / 2, num_gt)
    gt[:, 3] = rng.uniform(6, size / 2, num_gt)
    gt_cls = rng.integers(0, C, num_gt).astype(np.float32)
    pred = np.zeros((A, 4), np.float32)
    pred[:, 0] = (x_shifts + 0.5) * stride + rng.normal(0, 2, A)
    pred[:, 1] = (y_shifts + 0.5) * stride + rng.normal(0, 2, A)
    pred[:, 2] = rng.uniform(4, 40, A)
    pred[:, 3] = rng.uniform(4, 40, A)
    obj = rng.normal(0, 1, A).astype(np.float32)
    cls = rng.normal(0, 1, (A, C)).astype(np.float32)
    return gt, gt_cls, pred, obj, cls, x_shifts, y_shifts, strides


@pytest.mark.parametrize("num_gt", [1, 3, 8])
def test_simota_matches_oracle(rng, num_gt):
    gt, gt_cls, pred, obj, cls, xs, ys, ss = _random_assignment_case(rng, num_gt)
    M = 16  # padded label count
    gt_pad = np.zeros((M, 4), np.float32)
    gt_pad[:num_gt] = gt
    cls_pad = np.zeros((M,), np.float32)
    cls_pad[:num_gt] = gt_cls
    valid = np.zeros((M,), bool)
    valid[:num_gt] = True

    out = simota_assign(
        jnp.asarray(gt_pad), jnp.asarray(cls_pad).astype(jnp.int32),
        jnp.asarray(valid), jnp.asarray(pred), jnp.asarray(obj),
        jnp.asarray(cls), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))

    fg_o, matched_o, ious_o, num_fg_o = np_simota(
        gt, gt_cls, pred, obj, cls, xs, ys, ss)

    np.testing.assert_array_equal(np.asarray(out.fg_mask), fg_o)
    assert int(out.num_fg) == num_fg_o
    got_matched = np.asarray(out.matched_gt)
    np.testing.assert_array_equal(got_matched[fg_o], matched_o[fg_o])
    np.testing.assert_allclose(np.asarray(out.pred_ious)[fg_o], ious_o[fg_o],
                               rtol=1e-4, atol=1e-5)


def test_simota_no_gt_is_all_background():
    M, A, C = 8, 64, 5
    out = simota_assign(
        jnp.zeros((M, 4)), jnp.zeros((M,), jnp.int32), jnp.zeros((M,), bool),
        jnp.ones((A, 4)), jnp.zeros((A,)), jnp.zeros((A, C)),
        jnp.zeros((A,)), jnp.zeros((A,)), jnp.ones((A,)))
    assert int(out.num_fg) == 0
    assert not bool(jnp.any(out.fg_mask))


# ---------------------------------------------------------------- full loss

def test_yolox_loss_finite_and_structured(rng):
    B, C = 2, 7
    levels = [
        jnp.asarray(rng.normal(0, 0.1, size=(B, 8, 8, 5 + C)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, size=(B, 4, 4, 5 + C)).astype(np.float32)),
    ]
    labels = np.zeros((B, 10, 5), np.float32)
    labels[0, 0] = [2, 32, 32, 20, 24]
    labels[0, 1] = [1, 10, 50, 12, 8]
    labels[1, 0] = [4, 40, 16, 30, 30]
    out = yolox_loss(levels, jnp.asarray(labels), num_classes=C, strides=(8, 16))
    for k in ("loss", "loss_iou", "loss_obj", "loss_cls", "loss_l1", "proportion"):
        assert k in out
        assert np.isfinite(float(out[k])), k
    assert float(out["loss"]) > 0


def test_yolox_loss_gradients_flow(rng):
    B, C = 1, 3
    labels = np.zeros((B, 5, 5), np.float32)
    labels[0, 0] = [1, 20, 20, 16, 16]

    def loss_fn(x):
        levels = [x]
        return yolox_loss(levels, jnp.asarray(labels), num_classes=C,
                          strides=(8,))["loss"]

    x0 = jnp.asarray(rng.normal(0, 0.1, size=(B, 8, 8, 8)).astype(np.float32))
    g = jax.grad(loss_fn)(x0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
