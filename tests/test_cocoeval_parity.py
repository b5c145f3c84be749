"""Randomized parity of our COCO evaluator against the reference's vendored
pycocotools cocoeval.py (VERDICT r1 #3 / weak #5).

The reference cocoeval is pure Python except maskUtils.iou; we import it with
a numpy bbIou stub injected as its `mask` sibling module, drive BOTH
evaluators through our coco_api.COCO (also exercising its class-API
compatibility), and require the full 12-stat vector to agree to 1e-8 on
scenarios that hit crowd/ignore regions, area-range edges, score ties, and
the >100-detections maxDets truncation."""

import copy
import importlib.util
import sys
import types

import numpy as np
import pytest

from pl_yolo_tpu.evaluators.coco_api import COCO
from pl_yolo_tpu.evaluators.coco_eval import COCOeval as OurCOCOeval

REF_COCOEVAL = "/root/reference/models/data/datasets/pycocotools/cocoeval.py"


def _bb_iou(dt, gt, iscrowd):
    """numpy maskApi bbIou: xywh IoU, IoA for crowd gt columns."""
    d = np.asarray(dt, np.float64).reshape(-1, 4)
    g = np.asarray(gt, np.float64).reshape(-1, 4)
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    ix = np.clip(
        np.minimum(d[:, None, 0] + d[:, None, 2], g[None, :, 0] + g[None, :, 2])
        - np.maximum(d[:, None, 0], g[None, :, 0]), 0, None)
    iy = np.clip(
        np.minimum(d[:, None, 1] + d[:, None, 3], g[None, :, 1] + g[None, :, 3])
        - np.maximum(d[:, None, 1], g[None, :, 1]), 0, None)
    inter = ix * iy
    darea = (d[:, 2] * d[:, 3])[:, None]
    union = darea + (g[:, 2] * g[:, 3])[None, :] - inter
    crowd = np.asarray(iscrowd, bool)[None, :]
    denom = np.where(crowd, darea, union) if crowd.any() else union
    return inter / np.maximum(denom, 1e-300)


@pytest.fixture(scope="module")
def ref_cocoeval_cls():
    if not hasattr(np, "float"):  # alias removed in numpy>=1.24; the
        np.float = float          # reference's cocoeval.py:387 still uses it
    pkg = types.ModuleType("_refpycoco")
    pkg.__path__ = []
    mask_mod = types.ModuleType("_refpycoco.mask")
    mask_mod.iou = _bb_iou
    sys.modules["_refpycoco"] = pkg
    sys.modules["_refpycoco.mask"] = mask_mod
    spec = importlib.util.spec_from_file_location(
        "_refpycoco.cocoeval", REF_COCOEVAL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_refpycoco.cocoeval"] = mod
    spec.loader.exec_module(mod)
    return mod.COCOeval


def make_scenario(rng, n_imgs=4, n_cats=3, crowd_frac=0.15, many_dets=False):
    images = [{"id": i + 1, "width": 640, "height": 480}
              for i in range(n_imgs)]
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns, dets = [], []
    aid = 1
    for img in images:
        for _ in range(int(rng.integers(0, 8))):
            scale = float(rng.choice([8, 20, 60, 200]))  # hits s/m/l ranges
            w = float(rng.uniform(0.5, 1.5)) * scale
            h = float(rng.uniform(0.5, 1.5)) * scale
            x = float(rng.uniform(0, 640 - min(w, 600)))
            y = float(rng.uniform(0, 480 - min(h, 440)))
            anns.append({
                "id": aid, "image_id": img["id"],
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [x, y, w, h], "area": w * h,
                "iscrowd": int(rng.random() < crowd_frac)})
            aid += 1
    for a in anns:
        if rng.random() < 0.85:
            x, y, w, h = a["bbox"]
            for _ in range(int(rng.integers(1, 4))):
                j = rng.normal(0, 0.15, 4)
                cat = (a["category_id"] if rng.random() < 0.9
                       else int(rng.integers(1, n_cats + 1)))
                dets.append({
                    "image_id": a["image_id"], "category_id": cat,
                    "bbox": [float(x + j[0] * w), float(y + j[1] * h),
                             float(max(w * (1 + j[2]), 1.0)),
                             float(max(h * (1 + j[3]), 1.0))],
                    # 2-decimal scores force ties -> stable-sort parity
                    "score": float(round(float(rng.random()), 2))})
    for img in images:  # pure false positives
        for _ in range(int(rng.integers(0, 4))):
            w = float(rng.uniform(4, 300))
            h = float(rng.uniform(4, 300))
            dets.append({
                "image_id": img["id"],
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [float(rng.uniform(0, 340)), float(rng.uniform(0, 180)),
                         w, h],
                "score": float(round(float(rng.random()), 2))})
    if many_dets:  # exercise the maxDets=100 truncation path
        for _ in range(130):
            dets.append({
                "image_id": images[0]["id"], "category_id": 1,
                "bbox": [float(rng.uniform(0, 600)), float(rng.uniform(0, 440)),
                         float(rng.uniform(4, 40)), float(rng.uniform(4, 40))],
                "score": float(round(float(rng.random()), 2))})
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, dets


def _run_both(ref_cls, gt, dets):
    coco_gt_ref = COCO(copy.deepcopy(gt))
    coco_dt_ref = coco_gt_ref.loadRes(copy.deepcopy(dets))
    ref = ref_cls(coco_gt_ref, coco_dt_ref, iouType="bbox")
    ref.evaluate()
    ref.accumulate()
    ref.summarize()

    coco_gt = COCO(copy.deepcopy(gt))
    coco_dt = coco_gt.loadRes(copy.deepcopy(dets))
    ours = OurCOCOeval(coco_gt, coco_dt, iouType="bbox")
    ours.evaluate()
    ours.accumulate()
    ours.summarize()
    return np.asarray(ref.stats, np.float64), np.asarray(ours.stats,
                                                         np.float64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_parity(ref_cocoeval_cls, seed):
    rng = np.random.default_rng(seed)
    gt, dets = make_scenario(rng, n_imgs=4 + seed, n_cats=2 + seed % 3,
                             many_dets=(seed == 2))
    if not dets:
        pytest.skip("empty scenario")
    ref_stats, our_stats = _run_both(ref_cocoeval_cls, gt, dets)
    np.testing.assert_allclose(our_stats, ref_stats, atol=1e-8,
                               err_msg=f"seed={seed}")


def test_crowd_ignore_semantics(ref_cocoeval_cls):
    """Detections inside a crowd region must be ignored (not FPs), crowd GTs
    matched repeatedly, and the crowd IoA denominator used."""
    gt = {
        "images": [{"id": 1, "width": 640, "height": 480}],
        "categories": [{"id": 1, "name": "c"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 300, 300], "area": 90000, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [400, 100, 60, 60], "area": 3600, "iscrowd": 0},
        ],
    }
    dets = [
        # two dets fully inside the crowd: IoA=1 -> both match it, ignored
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [150, 150, 60, 60],
         "score": 0.8},
        # one real TP
        {"image_id": 1, "category_id": 1, "bbox": [401, 101, 59, 60],
         "score": 0.7},
    ]
    ref_stats, our_stats = _run_both(ref_cocoeval_cls, gt, dets)
    np.testing.assert_allclose(our_stats, ref_stats, atol=1e-8)
    assert our_stats[1] == 1.0  # AP50: crowd dets ignored, TP perfect
