"""COCO API class tests (vendored-pycocotools parity surface)."""

import numpy as np
import pytest

from pl_yolo_tpu.evaluators.coco_api import COCO

DATASET = {
    "images": [{"id": 1, "height": 20, "width": 30, "file_name": "a.jpg"},
               {"id": 2, "height": 20, "width": 30, "file_name": "b.jpg"}],
    "annotations": [
        {"id": 10, "image_id": 1, "category_id": 3, "bbox": [2, 2, 8, 6],
         "area": 48, "iscrowd": 0,
         "segmentation": [[2, 2, 10, 2, 10, 8, 2, 8]]},
        {"id": 11, "image_id": 1, "category_id": 5, "bbox": [12, 4, 6, 6],
         "area": 36, "iscrowd": 0, "segmentation": []},
        {"id": 12, "image_id": 2, "category_id": 3, "bbox": [0, 0, 5, 5],
         "area": 25, "iscrowd": 1, "segmentation": []},
    ],
    "categories": [{"id": 3, "name": "cat"}, {"id": 5, "name": "dog"}],
}


@pytest.fixture
def coco():
    return COCO(DATASET)


def test_index_and_gets(coco):
    assert coco.getImgIds() == [1, 2]
    assert coco.getCatIds() == [3, 5]
    assert coco.getCatIds(catNms=["dog"]) == [5]
    assert sorted(coco.getAnnIds(imgIds=1)) == [10, 11]
    assert coco.getAnnIds(catIds=3) == [10, 12]
    assert coco.getAnnIds(iscrowd=1) == [12]
    assert coco.getAnnIds(areaRng=[30, 50]) == [10, 11]
    assert coco.getImgIds(catIds=[5]) == [1]
    assert coco.getCatNames() == ["cat", "dog"]
    assert coco.getCatNames([5, 3]) == ["dog", "cat"]


def test_load_res_from_list(coco):
    dets = [{"image_id": 1, "category_id": 3, "bbox": [2, 2, 8, 6],
             "score": 0.9, "segmentation": []}]
    res = coco.loadRes(dets)
    anns = res.loadAnns(res.getAnnIds(imgIds=1))
    assert len(anns) == 1
    assert anns[0]["area"] == 48
    assert anns[0]["iscrowd"] == 0
    assert res.getCatIds() == [3, 5]


def test_load_res_rejects_unknown_image(coco):
    with pytest.raises(AssertionError):
        coco.loadRes([{"image_id": 99, "category_id": 3,
                       "bbox": [0, 0, 1, 1], "score": 0.5}])


def test_load_numpy_annotations(coco):
    arr = np.array([[1, 2, 2, 8, 6, 0.75, 3]])
    res = coco.loadRes(arr)
    a = res.loadAnns(res.getAnnIds())[0]
    assert a["category_id"] == 3 and a["score"] == 0.75


def test_ann_to_mask_polygon(coco):
    ann = coco.loadAnns([10])[0]
    mask = coco.annToMask(ann)
    assert mask.shape == (20, 30)
    assert mask.sum() > 0
    # mask confined to the polygon's bbox
    ys, xs = np.where(mask)
    assert xs.min() >= 2 and xs.max() <= 10
    assert ys.min() >= 2 and ys.max() <= 8
