"""Multi-scale bucketed training (VERDICT r1 #5 / BASELINE config #5):
device-side bucket resize with labels riding along; one compiled step per
bucket inside the Trainer."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from synthetic_coco import make_coco
from test_e2e import TINY_MODEL, _data_cfg


def test_multiscale_resize_geometry():
    from pl_yolo_tpu.data.augment import multiscale_resize

    img = np.zeros((2, 64, 64, 3), np.float32)
    img[:, 16:32, 16:32] = 255.0
    labels = np.zeros((2, 5, 5), np.float32)
    labels[:, 0] = [1, 24, 24, 16, 16]
    out, labs = jax.jit(
        lambda i, l: multiscale_resize(i, l, (96, 96))
    )(jnp.asarray(img), jnp.asarray(labels))
    out, labs = np.asarray(out), np.asarray(labs)
    assert out.shape == (2, 96, 96, 3)
    np.testing.assert_allclose(labs[0, 0], [1, 36, 36, 24, 24], atol=1e-4)
    # the bright square lands at 1.5x coords
    assert out[0, 26:46, 26:46, 0].min() > 200
    assert np.abs(out[0, :22, :, 0]).max() == 0.0

    # identity bucket is a no-op
    same, same_l = multiscale_resize(jnp.asarray(img), jnp.asarray(labels),
                                     (64, 64))
    np.testing.assert_array_equal(np.asarray(same), img)


def _grid_anchors(hw, strides):
    xs, ys, ss = [], [], []
    for s in strides:
        h, w = hw[0] // s, hw[1] // s
        yy, xx = np.mgrid[0:h, 0:w]
        xs.append(xx.ravel().astype(np.float32))
        ys.append(yy.ravel().astype(np.float32))
        ss.append(np.full(h * w, s, np.float32))
    return (np.concatenate(xs), np.concatenate(ys), np.concatenate(ss))


def test_assignment_quality_at_nonbase_bucket():
    """VERDICT r2 weak #7: labels scaled by multiscale_resize must still
    produce geometrically-correct SimOTA assignments at the bucket size —
    every matched anchor sits in the SCALED box/center window, and the
    foreground centroid tracks the scale (not the base-size position)."""
    from pl_yolo_tpu.data.augment import multiscale_resize
    from pl_yolo_tpu.models.losses.yolox import simota_assign

    strides = [8, 16, 32]
    img = np.zeros((1, 64, 64, 3), np.float32)
    labels = np.zeros((1, 5, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 24, 24]  # cls, cx, cy, w, h at base 64

    _, labs96 = multiscale_resize(jnp.asarray(img), jnp.asarray(labels),
                                  (96, 96))
    labs96 = np.asarray(labs96)
    np.testing.assert_allclose(labs96[0, 0], [1, 48, 48, 36, 36], atol=1e-4)

    results = {}
    for size, labs in ((64, labels), (96, labs96)):
        xg, yg, sg = _grid_anchors((size, size), strides)
        A = xg.shape[0]
        # plausible per-anchor predictions: centered on the anchor, 4-stride
        pred = np.stack([(xg + 0.5) * sg, (yg + 0.5) * sg,
                         4.0 * sg, 4.0 * sg], -1).astype(np.float32)
        gt_boxes = jnp.asarray(labs[0, :, 1:5])
        gt_cls = jnp.asarray(labs[0, :, 0].astype(np.int32))
        gt_valid = jnp.asarray(labs[0, :, 3] > 0)
        out = jax.jit(simota_assign)(
            gt_boxes, gt_cls, gt_valid, jnp.asarray(pred),
            jnp.zeros((A,), jnp.float32), jnp.zeros((A, 3), jnp.float32),
            jnp.asarray(xg), jnp.asarray(yg), jnp.asarray(sg))
        fg = np.asarray(out.fg_mask)
        assert float(out.num_fg) >= 1.0, f"no positives at {size}"
        xc, yc = (xg + 0.5) * sg, (yg + 0.5) * sg
        gcx, gcy, gw, gh = labs[0, 0, 1:5]
        in_box = ((np.abs(xc - gcx) < gw / 2) & (np.abs(yc - gcy) < gh / 2))
        in_ctr = ((np.abs(xc - gcx) < 2.5 * sg) & (np.abs(yc - gcy) < 2.5 * sg))
        assert np.all((in_box | in_ctr)[fg]), (
            f"matched anchors outside the scaled gt window at {size}")
        assert np.all(np.asarray(out.matched_gt)[fg] == 0)
        results[size] = (float(out.num_fg),
                         float(np.mean(xc[fg])), float(np.mean(yc[fg])))

    # the fg centroid moved with the scale: near 32 at base, near 48 at 1.5x
    assert abs(results[64][1] - 32) < 8 and abs(results[64][2] - 32) < 8
    assert abs(results[96][1] - 48) < 12 and abs(results[96][2] - 48) < 12
    # comparable assignment richness across buckets (same geometry, scaled)
    assert results[96][0] >= 0.5 * results[64][0]


def test_trainer_cycles_buckets(tmp_path, monkeypatch):
    import pl_yolo_tpu.data.augment as aug_mod
    from pl_yolo_tpu.train import trainer as trainer_mod

    traced_sizes = []
    real_resize = aug_mod.multiscale_resize

    def spy(images, labels, out_hw):
        traced_sizes.append(tuple(out_hw))
        return real_resize(images, labels, out_hw)

    monkeypatch.setattr(aug_mod, "multiscale_resize", spy)

    data_cfg = _data_cfg(make_coco(tmp_path / "coco", num_images=8))
    data_cfg["transform"]["multiscale_sizes"] = [[96, 96]]
    data_cfg["transform"]["multiscale_interval"] = 1
    t = trainer_mod.Trainer(copy.deepcopy(TINY_MODEL), data_cfg, max_epochs=1,
                            check_val_every_n_epoch=5,
                            output_dir=str(tmp_path / "runs"), logger="csv",
                            seed=96)
    t.fit()
    # the 96x96 bucket step was traced (compiled) and ran with finite loss
    assert (96, 96) in traced_sizes
    assert np.isfinite(t.best_map) or t.best_map == 0.0
