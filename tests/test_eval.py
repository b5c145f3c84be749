"""Evaluator tests: COCO-protocol mAP and VOC AP on hand-computed cases."""

import numpy as np
import pytest

from pl_yolo_tpu.evaluators.coco_eval import evaluate_coco, coco_evaluator
from pl_yolo_tpu.evaluators.voc_eval import average_precision, voc_evaluator
from pl_yolo_tpu.evaluators.format import format_outputs
from pl_yolo_tpu.ops.nms import Detections

import jax.numpy as jnp


def _gt(image_id, cat, box):
    return {"image_id": image_id, "category_id": cat, "bbox": list(box)}


def _det(image_id, cat, box, score):
    return {"image_id": image_id, "category_id": cat, "bbox": list(box),
            "score": score}


def test_perfect_detections_give_ap_1():
    gts = [_gt(1, 1, [10, 10, 50, 40]), _gt(1, 1, [100, 100, 30, 30]),
           _gt(2, 1, [5, 5, 20, 20])]
    dets = [_det(g["image_id"], g["category_id"], g["bbox"], 0.9) for g in gts]
    m = evaluate_coco(dets, gts)
    assert m["AP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AR100"] == pytest.approx(1.0)


def test_half_recall_ap():
    # two GTs, one perfect detection -> recall 0.5, precision 1 everywhere
    gts = [_gt(1, 1, [10, 10, 50, 40]), _gt(1, 1, [100, 100, 30, 30])]
    dets = [_det(1, 1, [10, 10, 50, 40], 0.9)]
    m = evaluate_coco(dets, gts)
    # 101-point: precision 1.0 at recall thresholds 0.00..0.50 -> 51/101
    assert m["AP50"] == pytest.approx(51 / 101, abs=1e-6)


def test_iou_threshold_cutoff():
    # det overlaps gt with IoU exactly 0.6: counts at thr<=0.6 only
    gts = [_gt(1, 1, [0, 0, 100, 10])]
    dets = [_det(1, 1, [0, 0, 60, 10], 0.9)]  # inter 60*10=600, union 1000
    m = evaluate_coco(dets, gts)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(0.0)
    # thresholds 0.5, 0.55, 0.6 match -> AP = 3/10
    assert m["AP"] == pytest.approx(3 / 10, abs=1e-6)


def test_false_positive_lowers_precision():
    gts = [_gt(1, 1, [10, 10, 50, 40])]
    dets = [_det(1, 1, [10, 10, 50, 40], 0.9),
            _det(1, 1, [300, 300, 50, 40], 0.95)]  # higher-scored FP
    m = evaluate_coco(dets, gts)
    # precision at full recall = 1/2 (FP ranked first)
    assert m["AP50"] == pytest.approx(0.5, abs=1e-6)


def test_area_range_buckets():
    # one small (16x16=256 < 1024) and one large GT (200x200)
    gts = [_gt(1, 1, [0, 0, 16, 16]), _gt(1, 1, [50, 50, 200, 200])]
    dets = [_det(1, 1, [0, 0, 16, 16], 0.9), _det(1, 1, [50, 50, 200, 200], 0.8)]
    m = evaluate_coco(dets, gts)
    assert m["APs"] == pytest.approx(1.0)
    assert m["APl"] == pytest.approx(1.0)
    assert m["APm"] == -1.0  # no medium GTs -> excluded


def test_multiclass_mean():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 2, [100, 100, 50, 50])]
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]  # class 2 missed entirely
    m = evaluate_coco(dets, gts)
    assert m["AP50"] == pytest.approx(0.5, abs=1e-6)


def test_summary_format():
    gts = [_gt(1, 1, [0, 0, 50, 50])]
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]
    m = evaluate_coco(dets, gts)
    s = m.summary
    assert "Average Precision" in s and "0.50:0.95" in s
    assert len(s.splitlines()) == 12


# --------------------------------------------------------------------- VOC

def test_voc_average_precision_area_mode():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    # envelope: p=1.0 up to r=0.5, then 0.5 -> AP = 0.5*1 + 0.5*0.5 = 0.75
    assert average_precision(rec, prec) == pytest.approx(0.75)


def test_voc_evaluator_perfect():
    gt_list = [[np.array([[10, 10, 60, 50]], np.float32)],
               [np.array([[5, 5, 25, 25]], np.float32)]]
    det_list = [[np.array([[10, 10, 60, 50, 0.9]], np.float32)],
                [np.array([[5, 5, 25, 25, 0.8]], np.float32)]]
    mAP, report = voc_evaluator(det_list, gt_list, class_names=["thing"])
    assert mAP == pytest.approx(1.0)
    assert "thing" in report and "mAP" in report


def test_voc_evaluator_double_detection_is_fp():
    gt_list = [[np.array([[10, 10, 60, 50]], np.float32)]]
    det_list = [[np.array([[10, 10, 60, 50, 0.9],
                           [11, 11, 60, 50, 0.8]], np.float32)]]
    mAP, _ = voc_evaluator(det_list, gt_list)
    assert mAP == pytest.approx(1.0)  # envelope area still 1 (TP ranked first)
    # a real FP (no overlap) ranked above the TP: precision at recall 1 is 0.5
    det_list = [[np.array([[300, 300, 350, 350, 0.9],
                           [10, 10, 60, 50, 0.8]], np.float32)]]
    mAP2, _ = voc_evaluator(det_list, gt_list)
    assert mAP2 == pytest.approx(0.5)


# ------------------------------------------------------------------ format

def test_format_outputs_unscales_letterbox():
    # one image, originally 1280x960 (h=960,w=1280), val_size 640 -> scale 0.5
    det = Detections(
        boxes=jnp.asarray([[[100.0, 50.0, 200.0, 150.0],
                            [0.0, 0.0, 0.0, 0.0]]]),
        scores=jnp.asarray([[0.8, 0.0]]),
        classes=jnp.asarray([[2, 0]]),
        valid=jnp.asarray([[True, False]]),
    )
    json_list, det_list = format_outputs(
        det, ids=[42], hs=[960], ws=[1280], val_size=(640, 640),
        class_ids=[11, 22, 33], num_classes=3)
    assert len(json_list) == 1
    j = json_list[0]
    assert j["image_id"] == 42 and j["category_id"] == 33
    assert j["bbox"] == [200.0, 100.0, 200.0, 200.0]  # /0.5, xywh
    assert det_list[0][2].shape == (1, 5)
    assert det_list[0][0].shape == (0, 5)


def test_nonfinite_detections_do_not_inflate_ap():
    """NaN boxes must not match GTs (NaN IoU comparisons) — a diverged model
    should score ~0, not 1.0 (found via derisk run)."""
    import warnings

    from pl_yolo_tpu.evaluators.coco_eval import evaluate_coco

    gts = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]}]
    dets = [
        {"image_id": 1, "category_id": 1,
         "bbox": [float("nan")] * 4, "score": 0.9},
        {"image_id": 1, "category_id": 1,
         "bbox": [100.0, 100.0, 5.0, 5.0], "score": float("nan")},
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = evaluate_coco(dets, gts)
    assert m["AP"] == 0.0 and m["AP50"] == 0.0
