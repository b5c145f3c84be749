"""COCOeval class API tests (bbox + segm via native RLE)."""

import numpy as np
import pytest

from pl_yolo_tpu.evaluators.coco_api import COCO
from pl_yolo_tpu.evaluators.coco_eval import COCOeval

GT = {
    "images": [{"id": 1, "height": 40, "width": 40, "file_name": "a.jpg"}],
    "annotations": [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [5, 5, 10, 10],
         "area": 100, "iscrowd": 0,
         "segmentation": [[5, 5, 15, 5, 15, 15, 5, 15]]},
    ],
    "categories": [{"id": 1, "name": "thing"}],
}


def test_cocoeval_bbox_perfect():
    gt = COCO(GT)
    dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                      "bbox": [5, 5, 10, 10], "score": 0.9}])
    e = COCOeval(gt, dt, iouType="bbox")
    e.evaluate()
    e.accumulate()
    stats = e.summarize()
    assert stats[0] == pytest.approx(1.0)   # AP
    assert stats[1] == pytest.approx(1.0)   # AP50
    assert len(stats) == 12


def test_cocoeval_segm_perfect():
    gt = COCO(GT)
    dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                      "bbox": [5, 5, 10, 10], "score": 0.9,
                      "segmentation": [[5, 5, 15, 5, 15, 15, 5, 15]]}])
    e = COCOeval(gt, dt, iouType="segm")
    stats = e.summarize()
    assert stats[0] == pytest.approx(1.0)


def test_cocoeval_crowd_gt_is_ignored():
    gt_doc = dict(GT)
    gt_doc["annotations"] = [dict(GT["annotations"][0], iscrowd=1)]
    gt = COCO(gt_doc)
    dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                      "bbox": [5, 5, 10, 10], "score": 0.9}])
    e = COCOeval(gt, dt, iouType="bbox")
    e.evaluate()
    # all GTs crowd -> no evaluatable gts -> AP stays -1
    assert e._metrics["AP"] == -1.0
