"""Tests for the auxiliary host-side augmentations + fusion utils."""

import numpy as np
import pytest

from pl_yolo_tpu.data.aug_extra import (
    copy_paste, cut_paste, cutout_rounding, extract_banks, make_host_augment,
)
from synthetic_coco import make_coco


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from pl_yolo_tpu.data.datasets import COCODataset
    root = make_coco(tmp_path_factory.mktemp("aux"), num_images=6)
    return COCODataset(str(root), "annotations/instances.json", "images",
                       img_size=(96, 96), max_labels=12)


def test_extract_banks(dataset):
    obj, bg = extract_banks(dataset, num_classes=3, max_per_class=5)
    assert len(obj) == 3
    assert any(len(b) > 0 for b in obj)
    assert len(bg) > 0
    assert bg[0].shape == (32, 32, 3)  # adapted to the 96px test images


def test_copy_paste_adds_labels(dataset):
    obj, _ = extract_banks(dataset, num_classes=3, max_per_class=5)
    img, labels, _, _ = dataset[0]
    img = img.copy()
    before = int((labels.sum(1) > 0).sum())
    rng = np.random.default_rng(1)
    img2, labels2 = copy_paste(img, labels.copy(), obj, rng=rng, max_paste=5)
    after = int((labels2.sum(1) > 0).sum())
    assert after >= before
    # new labels are inside the frame
    v = labels2.sum(1) > 0
    assert (labels2[v, 1] <= 96).all() and (labels2[v, 2] <= 96).all()


def test_cut_paste_blends(dataset):
    _, bg = extract_banks(dataset, num_classes=3, max_per_class=5)
    img, _, _, _ = dataset[0]
    out = cut_paste(img.copy(), bg, rng=np.random.default_rng(2))
    assert out.shape == img.shape
    assert out.dtype == np.uint8


def test_cutout_rounding_respects_boxes(dataset):
    img, labels, _, _ = dataset[0]
    out = cutout_rounding(img.copy(), labels, rng=np.random.default_rng(3))
    assert out.shape == img.shape


def test_make_host_augment_gating(dataset):
    assert make_host_augment({"copypaste_prob": 0, "cutpaste_prob": 0,
                              "cutoutR_prob": 0}, dataset, 3) is None
    aug = make_host_augment({"copypaste_prob": 1.0}, dataset, 3)
    img, labels, _, _ = dataset[1]
    img2, labels2 = aug(img, labels)
    assert img2.shape == img.shape and labels2.shape == labels.shape


def test_fuse_conv_bn_matches_unfused():
    import jax, jax.numpy as jnp
    from flax import linen as nn
    from pl_yolo_tpu.layers.blocks import ConvBlock, BN_EPS
    from pl_yolo_tpu.utils.fuse import fuse_conv_bn

    m = ConvBlock(8, ksize=3, act=None)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 8, 8, 4)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x, False)
    # make stats non-trivial
    v = jax.tree.map(lambda a: a, v)
    stats = {"mean": jnp.asarray(np.random.default_rng(5).normal(size=8), jnp.float32),
             "var": jnp.abs(jnp.asarray(np.random.default_rng(6).normal(size=8), jnp.float32)) + 0.5}
    v["batch_stats"]["bn"]["mean"] = stats["mean"]
    v["batch_stats"]["bn"]["var"] = stats["var"]
    want = m.apply(v, x, False)

    k, b = fuse_conv_bn(v["params"]["conv"]["kernel"],
                        v["params"]["bn"]["scale"], v["params"]["bn"]["bias"],
                        stats["mean"], stats["var"], BN_EPS)
    got = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fuse_repconv_matches_unfused():
    import jax, jax.numpy as jnp
    from pl_yolo_tpu.models.necks.yolov7_neck import RepConv
    from pl_yolo_tpu.utils.fuse import fuse_repconv

    m = RepConv(6, act="identity")
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 8, 8, 6)),
                    jnp.float32)
    v = m.init(jax.random.key(1), x, False)
    # randomize stats so fusion is non-trivial
    rng = np.random.default_rng(8)
    for bn in ("rbr_dense_bn", "rbr_1x1_bn", "rbr_identity"):
        v["batch_stats"][bn]["mean"] = jnp.asarray(rng.normal(size=6), jnp.float32)
        v["batch_stats"][bn]["var"] = jnp.asarray(
            np.abs(rng.normal(size=6)) + 0.5, jnp.float32)
    want = m.apply(v, x, False)
    k, b = fuse_repconv(v["params"], v["batch_stats"])
    got = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
