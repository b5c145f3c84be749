"""ZeRO-1-style optimizer-state sharding (`parallel: {zero: true}`):
optimizer moments + EMA copies shard over 'data' (parallel/mesh.py::
zero_spec), params/grads stay replicated, and the train step's numerics are
untouched — dp8+zero must produce the plain-dp8 loss/params. The reference
has no equivalent (single-GPU trainer); this is the TPU-native scaling
analogue of torch's ZeRO/FSDP optimizer-state sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pl_yolo_tpu.parallel.mesh import (batch_sharding, make_mesh, shard_tp,
                                       state_specs, zero_constraint,
                                       zero_spec)

MODEL_CFG = {
    "name": "tiny_yolox_zero",
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


def _path(s):
    return (jax.tree_util.GetAttrKey(s.lstrip(".")),)


def test_zero_spec_rules():
    conv = np.zeros((3, 3, 16, 32))
    bias = np.zeros((32,))
    odd = np.zeros((3, 3, 7))  # no axis divides 8
    opt = _path("opt_state")
    par = _path("params")
    # first free divisible axis shards over 'data' (cin=16 here: kh/kw=3
    # don't divide 8; the spec keeps the trailing None padding)
    assert zero_spec(opt, conv, P(), 8) == P(None, None, "data", None)
    assert zero_spec(opt, bias, P(), 8) == P("data")
    # composes with an existing tp spec: cout taken -> cin gets 'data'
    assert (zero_spec(opt, conv, P(None, None, None, "model"), 8)
            == P(None, None, "data", "model"))
    # params are NOT zero-sharded (ZeRO-1, not ZeRO-3)
    assert zero_spec(par, conv, P(), 8) == P()
    # nothing divisible -> stays on the base spec
    assert zero_spec(opt, odd, P(), 8) == P()


def _run_one_step(mesh, images, labels, zero):
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step

    model = build_model(dict(MODEL_CFG), num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    tx, _ = build_optimizer(MODEL_CFG["optimizer"], total_steps=10)
    state = TrainState.create(variables, tx)
    state = shard_tp(state, mesh, zero=zero)
    step = make_train_step(
        model.module.apply, model.loss.train_loss, donate=False,
        constrain_state=zero_constraint(state, mesh) if zero else None)
    imgs = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    labs = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
    with mesh:
        new_state, losses = step(state, imgs, labs, jax.random.key(1))
        jax.block_until_ready(losses["loss"])
    return new_state, losses


def _moment_leaves(state):
    import jax.tree_util as jtu
    return [(jtu.keystr(p), x) for p, x in
            jtu.tree_leaves_with_path(state.opt_state)
            if getattr(x, "ndim", 0) >= 1]


def test_dp8_zero_equals_dp8_and_actually_shards():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(5)
    images = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    labels[:, 1] = [0, 16, 40, 12, 18]
    mesh = make_mesh(model=1)

    st_dp, l_dp = _run_one_step(mesh, images, labels, zero=False)
    st_z, l_z = _run_one_step(mesh, images, labels, zero=True)

    # numerics: ZeRO is a layout change, not a math change
    np.testing.assert_allclose(float(l_dp["loss"]), float(l_z["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_dp.params)[:6],
                    jax.tree.leaves(st_z.params)[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # layout: post-step moments and EMA really live sharded over 'data' —
    # each device holds 1/8 of every divisible moment leaf
    n_sharded = 0
    for name, x in _moment_leaves(st_z):
        full = int(np.prod(x.shape))
        local = int(np.prod(x.addressable_shards[0].data.shape))
        if any(d % 8 == 0 and d > 0 for d in x.shape):
            assert local * 8 == full, (name, x.shape, x.sharding)
            n_sharded += 1
    assert n_sharded >= 10
    ema_kernel = jax.tree.leaves(st_z.ema_params)[1]  # a conv kernel
    assert (int(np.prod(ema_kernel.addressable_shards[0].data.shape)) * 8
            == int(np.prod(ema_kernel.shape)))
    # ...and the plain-dp run keeps everything replicated
    for _, x in _moment_leaves(st_dp):
        assert (int(np.prod(x.addressable_shards[0].data.shape))
                == int(np.prod(x.shape)))


def test_trainer_zero_config_surface(tmp_path):
    from pl_yolo_tpu.train.trainer import Trainer

    data_cfg = {
        "name": "t", "datamodule": "coco", "num_classes": 3,
        "classes": ["a", "b", "c"],
        "dataset": {"dir": str(tmp_path), "train": "x", "train_json": "x",
                    "val": "x", "val_json": "x", "train_size": [64, 64],
                    "val_size": [64, 64], "train_batch_size": 8,
                    "val_batch_size": 8},
    }
    cfg = dict(MODEL_CFG, parallel={"zero": True})
    tr = Trainer(cfg, data_cfg, output_dir=str(tmp_path / "runs"))
    assert tr.zero_par is True
    st = tr._build_state(total_steps=10)
    specs = state_specs(st, tr.mesh, zero=True)
    assert any("data" in tuple(s)
               for s in jax.tree.leaves(specs.opt_state)
               if isinstance(s, P))
