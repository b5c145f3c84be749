"""Native RLE mask ops tests vs dense numpy ground truth."""

import numpy as np
import pytest

from pl_yolo_tpu.evaluators import mask_ops as M


@pytest.fixture(scope="module")
def rand_masks():
    rng = np.random.default_rng(3)
    masks = []
    for _ in range(4):
        m = np.zeros((23, 31), np.uint8)
        for _ in range(3):
            y, x = rng.integers(0, 15), rng.integers(0, 20)
            h, w = rng.integers(3, 8), rng.integers(3, 10)
            m[y:y + h, x:x + w] = 1
        masks.append(m)
    return masks


def test_encode_decode_roundtrip(rand_masks):
    for m in rand_masks:
        rle = M.encode(m)
        assert rle["size"] == [23, 31]
        assert isinstance(rle["counts"], str)
        back = M.decode(rle)
        np.testing.assert_array_equal(back, m)


def test_area(rand_masks):
    for m in rand_masks:
        assert M.area(M.encode(m)) == int(m.sum())


def test_merge_union_intersect(rand_masks):
    a, b = rand_masks[0], rand_masks[1]
    ra, rb = M.encode(a), M.encode(b)
    u = M.decode(M.merge([ra, rb], intersect=False))
    i = M.decode(M.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(u, (a | b))
    np.testing.assert_array_equal(i, (a & b))


def test_rle_iou_matches_dense(rand_masks):
    rles = [M.encode(m) for m in rand_masks]
    got = M.iou(rles[:2], rles[2:], iscrowd=[0, 0])
    for i in range(2):
        for j in range(2):
            a, b = rand_masks[i], rand_masks[2 + j]
            inter = (a & b).sum()
            union = (a | b).sum()
            want = inter / union if union else 0.0
            assert got[i, j] == pytest.approx(want, abs=1e-9)


def test_crowd_iou_denominator(rand_masks):
    a, b = rand_masks[0], rand_masks[1]
    got = M.iou([M.encode(a)], [M.encode(b)], iscrowd=[1])[0, 0]
    want = (a & b).sum() / a.sum()
    assert got == pytest.approx(want, abs=1e-9)


def test_bbox_roundtrip():
    rle = M.frBbox([3, 4, 10, 6], 23, 31)
    m = M.decode(rle)
    want = np.zeros((23, 31), np.uint8)
    want[4:10, 3:13] = 1
    np.testing.assert_array_equal(m, want)
    box = M.toBbox(rle)
    np.testing.assert_allclose(box, [3, 4, 10, 6])


def test_bbox_iou_with_crowd():
    dets = np.array([[0, 0, 10, 10]], np.float64)
    gts = np.array([[5, 0, 10, 10]], np.float64)
    plain = M.iou(dets, gts, iscrowd=[0])[0, 0]
    crowd = M.iou(dets, gts, iscrowd=[1])[0, 0]
    assert plain == pytest.approx(50 / 150)
    assert crowd == pytest.approx(50 / 100)


def test_polygon_rasterization_square():
    # axis-aligned square: exact fill expected
    poly = [2, 3, 12, 3, 12, 9, 2, 9]
    rle = M.frPoly(poly, 16, 16)
    m = M.decode(rle)
    # interior pixels whose centers fall inside [2,12]x[3,9]
    want = np.zeros((16, 16), np.uint8)
    want[3:9, 2:12] = 1
    np.testing.assert_array_equal(m, want)


def test_fr_py_objects_polymorphism():
    rle = M.frPyObjects([[0, 0, 4, 0, 4, 4, 0, 4]], 8, 8)
    assert isinstance(rle, list) and M.area(rle[0]) > 0
    rles = M.frPyObjects(np.array([[1, 1, 3, 3]], np.float64), 8, 8)
    assert M.area(rles[0]) == 9


def test_string_coding_stability():
    # decode(encode(x)) through the compressed-string path must be stable
    m = np.zeros((40, 40), np.uint8)
    m[10:30, 5:35] = 1
    rle = M.encode(m)
    rle2 = M.encode(M.decode(rle))
    assert rle["counts"] == rle2["counts"]
