"""Spatial partitioning (SP): the 'spatial' mesh axis shards activation H
across chips — the TPU-idiomatic path for scaling a single large image.
User-reachable via `parallel: {spatial: N}`; GSPMD inserts the conv halo
exchanges from the single in-step sharding constraint
(parallel/mesh.py::sp_constraint). The reference has no equivalent (it
trains single-GPU, SURVEY §2.6); numerics must match pure DP because
BatchNorm reductions stay global."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pl_yolo_tpu.parallel.mesh import (
    make_mesh, shard_batch, shard_tp, sp_constraint)

MODEL_CFG = {
    "name": "tiny_yolox_sp",
    "backbone": {"name": "cspdarknet", "channels": [8, 16, 32, 64, 128],
                 "depths": [1, 1, 1, 1],
                 "outputs": ["stage2", "stage3", "stage4"]},
    "neck": {"name": "csppafpn", "channels": [32, 64, 128],
             "depths": [1, 1, 1, 1]},
    "head": {"name": "decoupled_head", "channels": [32, 64, 128]},
    "loss": {"name": "yolox"},
    "optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                  "weight_decay": 0.0005, "warmup_epochs": 0},
}


def test_sp_constraint_none_on_trivial_axis():
    assert sp_constraint(make_mesh()) is None
    assert sp_constraint(make_mesh(spatial=2)) is not None


def test_shard_batch_shards_image_h_over_spatial():
    mesh = make_mesh(spatial=2)
    batch = {"images": jnp.zeros((8, 64, 64, 3)),
             "labels": jnp.zeros((8, 10, 5))}
    out = shard_batch(mesh, batch)
    img_spec = out["images"].sharding.spec
    lab_spec = out["labels"].sharding.spec
    assert tuple(img_spec)[:2] == ("data", "spatial")
    assert tuple(lab_spec)[:1] == ("data",)


def _run_one_step(mesh, images, labels):
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step

    model = build_model(dict(MODEL_CFG), num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    tx, _ = build_optimizer(MODEL_CFG["optimizer"], total_steps=10)
    state = TrainState.create(variables, tx)
    state = shard_tp(state, mesh)
    step = make_train_step(model.module.apply, model.loss.train_loss,
                           donate=False,
                           constrain_images=sp_constraint(mesh))
    b = shard_batch(mesh, {"images": jnp.asarray(images),
                           "labels": jnp.asarray(labels)})
    with mesh:
        new_state, losses = step(state, b["images"], b["labels"],
                                 jax.random.key(1))
        jax.block_until_ready(losses["loss"])
    return new_state, losses


def test_dp8_equals_dp4_sp2_and_dp2_tp2_sp2():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    labels[:, 1] = [0, 16, 40, 12, 18]

    st_dp, l_dp = _run_one_step(make_mesh(), images, labels)
    st_sp, l_sp = _run_one_step(make_mesh(spatial=2), images, labels)
    # the full 3D composition: dp x tp x sp on one mesh
    st_3d, l_3d = _run_one_step(make_mesh(model=2, spatial=2),
                                images, labels)

    for l_other in (l_sp, l_3d):
        np.testing.assert_allclose(float(l_dp["loss"]),
                                   float(l_other["loss"]), rtol=2e-4)
    # parameter-level parity after the optimizer update
    leaves_dp = jax.tree.leaves(st_dp.params)
    for st_other in (st_sp, st_3d):
        for a, b in zip(leaves_dp[:6], jax.tree.leaves(st_other.params)[:6]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)


def test_trainer_spatial_config_surface(tmp_path):
    from pl_yolo_tpu.train.trainer import Trainer

    data_cfg = {
        "name": "t", "datamodule": "coco", "num_classes": 3,
        "classes": ["a", "b", "c"],
        "dataset": {"dir": str(tmp_path), "train": "x", "train_json": "x",
                    "val": "x", "val_json": "x", "train_size": [64, 64],
                    "val_size": [64, 64], "train_batch_size": 8,
                    "val_batch_size": 8},
    }
    cfg = dict(MODEL_CFG, parallel={"spatial": 2})
    tr = Trainer(cfg, data_cfg, output_dir=str(tmp_path / "runs"))
    assert dict(tr.mesh.shape) == {"data": 4, "model": 1, "spatial": 2, "pipe": 1, "expert": 1}

    # H not divisible through the /32 pyramid is a hard config error
    data_bad = dict(data_cfg)
    data_bad["dataset"] = dict(data_cfg["dataset"], train_size=[96, 96])
    with pytest.raises(ValueError, match="divisible by 32"):
        Trainer(cfg, data_bad, output_dir=str(tmp_path / "runs2"))

    # model x spatial must divide the device count
    bad = dict(MODEL_CFG, parallel={"model": 2, "spatial": 3})
    with pytest.raises(ValueError, match="parallel.model"):
        Trainer(bad, data_cfg, output_dir=str(tmp_path / "runs3"))
