"""Epoch-gated YOLOX no-aug schedule (VERDICT r1 #4): the last N epochs run
with mosaic/mixup off and the L1 loss term on, via traced flags through ONE
compiled train step."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthetic_coco import make_coco
from test_e2e import TINY_MODEL, _data_cfg


def test_traced_aug_enable_gates_mosaic():
    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (4, 64, 64, 3)), jnp.float32)
    labels = np.zeros((4, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    labels = jnp.asarray(labels)
    cfg = AugmentConfig(mosaic_prob=1.0, mixup_prob=1.0, hsv_prob=0.0,
                        flip_prob=0.0, max_labels=10)
    f = jax.jit(lambda k, e: device_augment(k, images, labels, cfg, enable=e))
    key = jax.random.key(7)
    on_img, on_lab = f(key, True)
    off_img, off_lab = f(key, False)
    # disabled: images pass through untouched (hsv/flip off here), labels
    # compact to the originals
    np.testing.assert_allclose(np.asarray(off_img), np.asarray(images),
                               atol=0.75)  # bf16 pixel roundtrip
    np.testing.assert_allclose(np.asarray(off_lab[:, 0]),
                               np.asarray(labels[:, 0]), atol=1e-3)
    assert not np.allclose(np.asarray(on_img), np.asarray(images), atol=1.0)


def test_traced_use_l1_gates_l1_term():
    from pl_yolo_tpu.models.losses.yolox import yolox_loss

    rng = np.random.default_rng(1)
    # channel count: 4 + 1 + num_classes(3) = 8
    outs = [jnp.asarray(rng.normal(0, 1, (2, 64 // s, 64 // s, 8)),
                        jnp.float32) for s in (8, 16, 32)]
    labels = np.zeros((2, 5, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 16, 16]
    labels = jnp.asarray(labels)
    f = jax.jit(lambda flag: yolox_loss(outs, labels, num_classes=3,
                                        use_l1=flag))
    l_on = f(True)
    l_off = f(False)
    assert float(l_on["loss_l1"]) > 0.0
    assert float(l_off["loss_l1"]) == 0.0
    np.testing.assert_allclose(float(l_on["loss_cls"]),
                               float(l_off["loss_cls"]), rtol=1e-6)


def test_trainer_flips_flags_at_configured_epoch(tmp_path, monkeypatch):
    """max_epochs=2, no_aug_epochs=1: epoch 0 -> aug on / L1 off, epoch 1 ->
    aug off / L1 on. Spy on the step function to record the flags."""
    from pl_yolo_tpu.train import trainer as trainer_mod

    seen = []
    real_make = trainer_mod.make_train_step

    def spy_make(*a, **kw):
        step = real_make(*a, **kw)

        def wrapped(state, images, labels, rng, **flags):
            seen.append(dict(flags))
            return step(state, images, labels, rng, **flags)
        return wrapped

    monkeypatch.setattr(trainer_mod, "make_train_step", spy_make)

    model_cfg = copy.deepcopy(TINY_MODEL)
    model_cfg["schedule"] = {"no_aug_epochs": 1, "use_l1": True}
    root = make_coco(tmp_path / "coco", num_images=8)
    t = trainer_mod.Trainer(model_cfg, _data_cfg(root), max_epochs=2,
                            check_val_every_n_epoch=5,
                            output_dir=str(tmp_path / "runs"), logger="csv")
    t.fit()
    assert len(seen) >= 2
    steps_per_epoch = len(seen) // 2
    epoch0, epoch1 = seen[0], seen[steps_per_epoch]
    assert epoch0 == {"aug_enable": True, "use_l1": False}
    assert epoch1 == {"aug_enable": False, "use_l1": True}
