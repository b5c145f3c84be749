"""utils/autoanchor.py: k-means anchor priors (beyond-reference utility;
the reference pins COCO-640 tables in config with no re-estimation —
reference configs/model/yolov7/*.yaml)."""

import json

import numpy as np
import pytest

from pl_yolo_tpu.utils.autoanchor import dataset_anchors, kmeans_anchors


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(3)
    truth = np.asarray([[10, 12], [30, 24], [80, 90]], np.float64)
    whs = np.concatenate([t + rng.normal(0, 0.5, (200, 2)) for t in truth])
    anchors = kmeans_anchors(whs, n_levels=3, per_level=1)
    got = np.asarray([lvl[0] for lvl in anchors])
    assert np.allclose(got, truth, atol=2.0), got


def test_levels_sorted_by_area_and_shapes():
    rng = np.random.default_rng(0)
    whs = rng.uniform(4, 120, (500, 2))
    anchors = kmeans_anchors(whs, n_levels=3, per_level=3)
    assert len(anchors) == 3 and all(len(l) == 3 for l in anchors)
    areas = [w * h for lvl in anchors for w, h in lvl]
    assert areas == sorted(areas)


def test_rejects_too_few_boxes():
    with pytest.raises(ValueError):
        kmeans_anchors(np.full((4, 2), 10.0))


def test_dataset_anchors_letterbox_scaling(tmp_path):
    # one 320x320 image with 40px boxes; at img_size 160 the letterbox
    # scale is 0.5 so anchors must come out ~20px
    coco = {
        "images": [{"id": 1, "width": 320, "height": 320}],
        "annotations": [
            {"image_id": 1, "bbox": [0, 0, 40 + i * 0.1, 40 + i * 0.1]}
            for i in range(20)
        ],
        "categories": [],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    anchors = dataset_anchors(str(p), n_levels=3, per_level=3,
                              img_size=(160, 160))
    flat = np.asarray([wh for lvl in anchors for wh in lvl])
    assert np.all(flat > 18) and np.all(flat < 23), flat
