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
        constrain_state=(zero_constraint(state, mesh, zero=zero)
                         if zero else None))
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


def test_dp8_zero_accumulate_end_to_end():
    """ZeRO + gradient accumulation actually TRAIN together (ADVICE r3):
    two dp8+zero+accumulate_steps=2 micro-steps must equal one plain-dp8
    update on the mean gradient, and MultiSteps' acc_grads buffer must stay
    'data'-sharded through the constrain_state/donation path."""
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(11)
    im1 = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    im2 = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    mesh = make_mesh(model=1)

    model = build_model(dict(MODEL_CFG), num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))

    def run(accum, zero, micro_batches):
        # warmup=0 so update 0's LR is horizon-independent (the schedule
        # horizon is total_steps/accum, which differs between the runs)
        tx, _ = build_optimizer(
            dict(MODEL_CFG["optimizer"], accumulate_steps=accum, warmup=0),
            total_steps=10)
        state = TrainState.create(
            jax.tree.map(lambda x: np.array(x, copy=True), variables), tx,
            use_ema=False)
        state = shard_tp(state, mesh, zero=zero)
        step = make_train_step(
            model.module.apply, model.loss.train_loss, use_ema=False,
            donate=True,
            constrain_state=zero_constraint(state, mesh) if zero else None)
        with mesh:
            for i, imgs in enumerate(micro_batches):
                state, losses = step(
                    state,
                    jax.device_put(jnp.asarray(imgs), batch_sharding(mesh)),
                    jax.device_put(jnp.asarray(labels), batch_sharding(mesh)),
                    jax.random.key(100 + i))
            jax.block_until_ready(losses["loss"])
        return state

    st_acc = run(accum=2, zero=True, micro_batches=[im1, im2])
    # reference: one plain-dp8 SGD update on the MEAN of the two micro-batch
    # grads == feeding both micro-batches through accumulate_steps=2. The
    # BN batch_stats paths differ (running stats tick per micro-step), so
    # compare PARAMS, which only move on the flush.
    st_a = run(accum=1, zero=False, micro_batches=[im1])
    st_b = run(accum=1, zero=False, micro_batches=[im2])
    # mean of the two single-step deltas = update on mean grad (plain SGD,
    # momentum buffer starts at 0, lr identical at schedule step 0)
    base = jax.tree.leaves(variables["params"])
    acc = jax.tree.leaves(st_acc.params)
    pa = jax.tree.leaves(st_a.params)
    pb = jax.tree.leaves(st_b.params)
    for v0, vacc, va, vb in list(zip(base, acc, pa, pb))[:10]:
        mean_delta = (np.asarray(va) - np.asarray(v0)
                      + np.asarray(vb) - np.asarray(v0)) / 2.0
        np.testing.assert_allclose(np.asarray(vacc) - np.asarray(v0),
                                   mean_delta, rtol=2e-3, atol=1e-6)

    # layout: acc_grads (and inner moments) stayed 'data'-sharded after two
    # donated steps through zero_constraint
    def _on_data(x):
        spec = getattr(getattr(x, "sharding", None), "spec", ())
        flat = []
        for part in tuple(spec):
            flat += list(part) if isinstance(part, tuple) else [part]
        return "data" in flat

    import optax
    assert isinstance(st_acc.opt_state, optax.MultiStepsState)
    acc_sharded = sum(1 for x in jax.tree.leaves(st_acc.opt_state.acc_grads)
                      if getattr(x, "ndim", 0) >= 1 and _on_data(x))
    assert acc_sharded >= 10, "acc_grads lost the ZeRO 'data' sharding"


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
    assert tr.zero_par == 1  # yaml true -> level 1; `zero: 3` -> level 3
    cfg3 = dict(MODEL_CFG, parallel={"zero": 3})
    tr3 = Trainer(cfg3, data_cfg, output_dir=str(tmp_path / "runs3"))
    assert tr3.zero_par == 3
    st = tr._build_state(total_steps=10)
    specs = state_specs(st, tr.mesh, zero=True)
    assert any("data" in tuple(s)
               for s in jax.tree.leaves(specs.opt_state)
               if isinstance(s, P))


def test_dp8_zero3_equals_dp8_and_shards_params():
    """ZeRO-3 (`parallel: {zero: 3}`): params themselves live 'data'-sharded
    at rest — GSPMD inserts the per-step param all-gather and gradient
    reduce-scatter — and one train step must match plain dp8 numerically
    (it is a layout change, not a math change)."""
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(13)
    images = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    mesh = make_mesh(model=1)

    st_dp, l_dp = _run_one_step(mesh, images, labels, zero=False)
    st_z3, l_z3 = _run_one_step(mesh, images, labels, zero=3)

    np.testing.assert_allclose(float(l_dp["loss"]), float(l_z3["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_dp.params)[:6],
                    jax.tree.leaves(st_z3.params)[:6]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # layout: post-step PARAMS really live sharded over 'data' (every leaf
    # with a divisible axis holds 1/8 locally); moments/EMA too
    import jax.tree_util as jtu
    n_sharded = 0
    for p, x in jtu.tree_leaves_with_path(st_z3.params):
        if getattr(x, "ndim", 0) < 1:
            continue
        full = int(np.prod(x.shape))
        local = int(np.prod(x.addressable_shards[0].data.shape))
        if any(d % 8 == 0 and d > 0 for d in x.shape):
            assert local * 8 == full, (jtu.keystr(p), x.shape, x.sharding)
            n_sharded += 1
    assert n_sharded >= 10
    # the dp run keeps params replicated
    for x in jax.tree.leaves(st_dp.params):
        if getattr(x, "ndim", 0) >= 1:
            assert (int(np.prod(x.addressable_shards[0].data.shape))
                    == int(np.prod(x.shape)))
    # and the zero3 compiled program really gathers/scatters parameters:
    # eval path still works from sharded params (decode shapes intact)
    assert np.isfinite(float(l_z3["loss"]))
