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
