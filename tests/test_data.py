"""Data pipeline tests: datasets, loader, device-side augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.data.augment import (
    AugmentConfig, bilinear_sample, device_augment, hsv_jitter,
)
from pl_yolo_tpu.data.datasets import COCODataset, VOCDataset, letterbox_image
from pl_yolo_tpu.data.loader import InfiniteSampler, TrainLoader, eval_batches

from synthetic_coco import make_coco, make_voc


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_coco(tmp_path_factory.mktemp("coco"))


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_voc(tmp_path_factory.mktemp("voc"))


def test_letterbox_geometry():
    from PIL import Image
    img = Image.new("RGB", (200, 100), (255, 0, 0))  # w=200, h=100
    out, r = letterbox_image(img, (64, 64))
    assert out.shape == (64, 64, 3)
    assert abs(r - 64 / 200) < 1e-9
    # content occupies top-left 32x64, rest is 114-gray
    assert (out[:32, :64, 0] > 200).all()
    assert (out[40:, :, :] == 114).all()


def test_coco_dataset_contract(coco_root):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64), max_labels=10)
    assert len(ds) == 4
    img, labels, (h, w), img_id = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert labels.shape == (10, 5)
    valid = labels.sum(1) > 0
    assert valid.any()
    r = min(64 / h, 64 / w)
    # boxes are inside the letterboxed content area
    assert (labels[valid, 1] <= w * r + 1e-3).all()
    assert (labels[valid, 2] <= h * r + 1e-3).all()
    assert ds.class_ids == [1, 2, 3]


def test_coco_ram_cache(coco_root):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64), cache=True)
    a = ds.load_image(1)
    b = ds.load_image(1)
    assert a is b  # second hit served from cache


def test_voc_dataset_contract(voc_root):
    ds = VOCDataset(str(voc_root), "ImageSets/Main/train.txt", img_size=(64, 64),
                    max_labels=8)
    assert len(ds) == 3
    img, labels, (h, w), _ = ds[0]
    assert img.shape == (64, 64, 3)
    assert (labels.sum(1) > 0).sum() == 1


def test_infinite_sampler_sharding():
    s0 = iter(InfiniteSampler(10, shard_id=0, num_shards=2, seed=5))
    s1 = iter(InfiniteSampler(10, shard_id=1, num_shards=2, seed=5))
    a = [next(s0) for _ in range(5)]
    b = [next(s1) for _ in range(5)]
    assert sorted(a + b) == list(range(10))  # disjoint cover of epoch 0


def test_train_loader_batches(coco_root):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64), max_labels=10)
    loader = TrainLoader(ds, batch_size=2)
    batch = next(loader)
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["labels"].shape == (2, 10, 5)
    loader.close()


def test_disk_cache_build_serve_and_stale_rebuild(coco_root, tmp_path):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64), max_labels=10)
    cache_dir = tmp_path / "dc"
    ds.attach_disk_cache(str(cache_dir), workers=2)
    # cached images identical to fresh decode
    for i in range(len(ds)):
        np.testing.assert_array_equal(ds.load_image(i), ds.decode_image(i))
    # reopen: fingerprint matches, no rebuild (mtime of data file unchanged)
    data_file = cache_dir / "images.u8"
    mtime = data_file.stat().st_mtime_ns
    ds2 = COCODataset(str(coco_root), "annotations/instances.json", "images",
                      img_size=(64, 64), max_labels=10)
    ds2.attach_disk_cache(str(cache_dir))
    assert data_file.stat().st_mtime_ns == mtime
    np.testing.assert_array_equal(ds2.load_image(1), ds.load_image(1))
    # different letterbox size -> stale -> rebuilt at the new shape
    ds3 = COCODataset(str(coco_root), "annotations/instances.json", "images",
                      img_size=(48, 48), max_labels=10)
    ds3.attach_disk_cache(str(cache_dir))
    assert ds3.load_image(0).shape == (48, 48, 3)
    np.testing.assert_array_equal(ds3.load_image(0), ds3.decode_image(0))


def test_multiworker_loader_matches_single_worker(coco_root):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64), max_labels=10)
    single = TrainLoader(ds, batch_size=2, num_workers=0, seed=7)
    multi = TrainLoader(ds, batch_size=2, num_workers=2, seed=7)
    try:
        for _ in range(6):  # spans an epoch boundary (4 imgs, bs 2)
            a, b = next(single), next(multi)
            np.testing.assert_array_equal(a["images"], b["images"])
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(a["img_id"], b["img_id"])
    finally:
        single.close()
        multi.close()


def test_device_prefetch_order_and_transform():
    from pl_yolo_tpu.data.loader import device_prefetch
    src = iter([{"x": np.full((2,), i)} for i in range(10)])
    calls = []

    def put(b):
        calls.append(int(b["x"][0]))
        return b["x"] + 100

    it = device_prefetch(src, put, depth=2)
    first = next(it)
    assert first[0] == 100
    assert calls[:3] == [0, 1, 2]  # ran 2 ahead of consumption
    assert [int(next(it)[0]) for _ in range(4)] == [101, 102, 103, 104]


def test_eval_batches_padding(coco_root):
    ds = COCODataset(str(coco_root), "annotations/instances.json", "images",
                     img_size=(64, 64))
    batches = list(eval_batches(ds, batch_size=3))
    assert len(batches) == 2
    assert batches[0]["count"] == 3
    assert batches[1]["count"] == 1
    assert batches[1]["images"].shape[0] == 3  # padded to full batch


# ------------------------------------------------------------- device aug

def test_bilinear_sample_identity_and_fill():
    img = jnp.asarray(np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3))
    ys, xs = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0), indexing="ij")
    out = bilinear_sample(img, xs, ys)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
    out = bilinear_sample(img, xs + 100.0, ys)
    assert (np.asarray(out) == 114.0).all()


def test_hsv_jitter_roundtrip_bounds(rng):
    img = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)).astype(np.float32))
    out = hsv_jitter(jax.random.key(0), img)
    assert out.shape == img.shape
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 255.0 + 1e-3


def test_device_augment_contract(rng):
    cfg = AugmentConfig(max_labels=20, mosaic_prob=1.0, mixup_prob=1.0,
                        hsv_prob=1.0, flip_prob=0.5)
    B, H, W, M = 4, 64, 64, 10
    images = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    labels = np.zeros((B, M, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 30, 30]
    labels[:, 1] = [0, 16, 16, 12, 12]
    out_imgs, out_labels = device_augment(
        jax.random.key(3), images, jnp.asarray(labels), cfg)
    assert out_imgs.shape == (B, H, W, 3)
    assert out_labels.shape == (B, 20, 5)
    ol = np.asarray(out_labels)
    valid = ol.sum(-1) != 0
    assert valid.any(), "augmentation should keep some boxes"
    # boxes within frame
    assert (ol[valid, 1] >= -1e-3).all() and (ol[valid, 1] <= W + 1e-3).all()
    assert (ol[valid, 3] > 0).all() and (ol[valid, 4] > 0).all()
    # valid rows are packed at the front
    for b in range(B):
        v = valid[b]
        if v.any():
            last_valid = np.max(np.where(v)[0])
            assert v[:last_valid + 1].all()


def test_device_augment_deterministic(rng):
    cfg = AugmentConfig(max_labels=16)
    images = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32))
    labels = np.zeros((4, 8, 5), np.float32)
    labels[:, 0] = [0, 16, 16, 10, 10]
    a = device_augment(jax.random.key(7), images, jnp.asarray(labels), cfg)
    b = device_augment(jax.random.key(7), images, jnp.asarray(labels), cfg)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_device_augment_no_mosaic_passthrough(rng):
    """With all probs 0 the images pass through untouched and labels are
    preserved (up to compaction)."""
    cfg = AugmentConfig(mosaic_prob=0.0, mixup_prob=0.0, hsv_prob=0.0,
                        flip_prob=0.0, max_labels=8, pixel_dtype="float32")
    images = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    labels = np.zeros((2, 8, 5), np.float32)
    labels[0, 0] = [2, 10, 12, 8, 6]
    out_imgs, out_labels = device_augment(
        jax.random.key(0), images, jnp.asarray(labels), cfg)
    np.testing.assert_allclose(np.asarray(out_imgs), np.asarray(images), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_labels)[0, 0], labels[0, 0], atol=1e-4)
    # default bf16 pixel path: error bounded by quantization (~1/255 of range)
    cfg16 = AugmentConfig(mosaic_prob=0.0, mixup_prob=0.0, hsv_prob=0.0,
                          flip_prob=0.0, max_labels=8)
    out16, _ = device_augment(jax.random.key(0), images, jnp.asarray(labels), cfg16)
    assert float(jnp.abs(out16 - images).max()) <= 1.0


def test_hsv_jitter_matches_classic_roundtrip(rng):
    """The fused branchless HSV (sector formula, 0..255 value domain)
    matches the classic i/p/q/t roundtrip formulation."""
    img = jnp.asarray(rng.uniform(0, 255, (32, 32, 3)).astype(np.float32))

    def classic(rng_, img_, hgain=0.015, sgain=0.7, vgain=0.4):
        r = jax.random.uniform(rng_, (3,), minval=-1.0, maxval=1.0)
        rgb = img_ / 255.0
        rc, gc, bc = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        maxc = jnp.max(rgb, axis=-1)
        minc = jnp.min(rgb, axis=-1)
        v = maxc
        delta = maxc - minc
        s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
        safe = jnp.maximum(delta, 1e-12)
        hr = ((gc - bc) / safe) % 6.0
        hg = (bc - rc) / safe + 2.0
        hb = (rc - gc) / safe + 4.0
        h = jnp.where(maxc == rc, hr, jnp.where(maxc == gc, hg, hb))
        h = jnp.where(delta > 0, h / 6.0, 0.0)
        h = (h * (r[0] * hgain + 1.0)) % 1.0
        s = jnp.clip(s * (r[1] * sgain + 1.0), 0.0, 1.0)
        v = jnp.clip(v * (r[2] * vgain + 1.0), 0.0, 1.0)
        i = jnp.floor(h * 6.0)
        f = h * 6.0 - i
        p = v * (1.0 - s)
        q = v * (1.0 - s * f)
        t = v * (1.0 - s * (1.0 - f))
        i = i.astype(jnp.int32) % 6
        sel = [i == k for k in range(6)]
        rr = jnp.select(sel, [v, q, p, p, t, v])
        gg = jnp.select(sel, [t, v, v, q, p, p])
        bb = jnp.select(sel, [p, p, t, v, v, q])
        return jnp.stack([rr, gg, bb], axis=-1) * 255.0

    for seed in range(3):
        key = jax.random.key(seed)
        want = np.asarray(classic(key, img))
        got = np.asarray(hsv_jitter(key, img))
        np.testing.assert_allclose(got, want, atol=0.01)
