"""Integration tests: optimizer, EMA, train step, sharded multi-device step,
synthetic overfit (SURVEY.md §4 'Integration' + 'Distributed')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.layers.schedules import cosine_warmup_schedule
from pl_yolo_tpu.models.detector import build_model
from pl_yolo_tpu.parallel.mesh import make_mesh, shard_batch
from pl_yolo_tpu.train.ema import ema_update
from pl_yolo_tpu.train.optim import build_optimizer
from pl_yolo_tpu.train.state import TrainState, make_train_step

TINY_CFG = {
    "backbone": {"name": "cspdarknet", "depths": [1, 1, 1, 1],
                 "channels": [8, 16, 32, 64, 128],
                 "outputs": ["stage2", "stage3", "stage4"],
                 "norm": "bn", "act": "silu"},
    "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
             "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
    "head": {"name": "decoupled_head", "num_anchor": 1,
             "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
    "loss": {"name": "yolox", "stride": [8, 16, 32]},
    "optimizer": {"name": "SGD", "learning_rate": 0.02, "momentum": 0.9,
                  "weight_decay": 0.0005, "warmup": 0.05, "ema": True},
}


def test_cosine_warmup_schedule_shape():
    sched = cosine_warmup_schedule(0.01, warmup_steps=10, max_steps=100)
    lrs = np.array([float(sched(s)) for s in range(100)])
    assert lrs[0] < 1e-4                     # warmup starts near zero
    assert abs(lrs.max() - 0.01) < 1.5e-3    # peaks near base_lr after warmup
    assert lrs[99] < 1e-3                    # decays to ~0
    assert np.argmax(lrs) >= 9


def test_ema_update_ramp():
    ema = {"w": jnp.ones((3,))}
    new = {"w": jnp.zeros((3,))}
    # very early: d ~ 0 -> ema ~ new
    early = ema_update(ema, new, jnp.asarray(1))
    assert float(early["w"][0]) < 0.001
    # late: d ~ decay -> ema barely moves
    late = ema_update(ema, new, jnp.asarray(100000))
    assert float(late["w"][0]) > 0.999


def _make_state(cfg, size=64, total_steps=50):
    model = build_model(cfg, num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(size, size))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps)
    state = TrainState.create(variables, tx)
    return model, state


def test_train_step_decreases_loss_overfit():
    """One fixed synthetic batch; loss must drop substantially (overfit)."""
    model, state = _make_state(TINY_CFG)
    step = make_train_step(model.module.apply, model.loss.train_loss)
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((2, 10, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 24, 24]
    labels[1, 0] = [2, 16, 48, 12, 20]
    labels = jnp.asarray(labels)

    key = jax.random.key(0)
    first = None
    for i in range(30):
        state, losses = step(state, images, labels, key)
        if i == 0:
            first = float(losses["loss"])
    last = float(losses["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 30


def test_train_step_sharded_over_mesh():
    """Same step under a ('data','model') mesh with the batch sharded on
    'data' across 8 virtual CPU devices."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    model, state = _make_state(TINY_CFG)
    step = make_train_step(model.module.apply, model.loss.train_loss)

    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 24, 24]
    batch = shard_batch(mesh, {"images": images, "labels": jnp.asarray(labels)})

    with mesh:
        state, losses = step(state, batch["images"], batch["labels"], jax.random.key(0))
        state, losses = step(state, batch["images"], batch["labels"], jax.random.key(1))
    assert np.isfinite(float(losses["loss"]))
    assert int(state.step) == 2


def test_sharded_matches_single_device():
    """The sharded step must be numerically equivalent to the unsharded one
    (GSPMD is a layout choice, not a semantics change)."""
    model, state0 = _make_state(TINY_CFG)
    step = make_train_step(model.module.apply, model.loss.train_loss, donate=False)
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [0, 32, 32, 20, 20]
    labels = jnp.asarray(labels)

    _, losses_single = step(state0, images, labels, jax.random.key(0))

    mesh = make_mesh()
    sharded = shard_batch(mesh, {"images": images, "labels": labels})
    with mesh:
        _, losses_sharded = step(state0, sharded["images"], sharded["labels"],
                                 jax.random.key(0))
    np.testing.assert_allclose(float(losses_single["loss"]),
                               float(losses_sharded["loss"]), rtol=2e-4)


def test_weight_decay_masks_bn_params():
    from pl_yolo_tpu.train.optim import _kernel_mask
    params = {"conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)},
              "bn": {"scale": jnp.ones(3), "bias": jnp.ones(3)}}
    mask = _kernel_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False


def test_train_step_sanitizer_metrics():
    """sanitize=True adds device-side grad_norm + nonfinite_grads to the
    step metrics (in-step sanitizer, SURVEY §5 aux systems)."""
    model, state = _make_state(TINY_CFG)
    step = make_train_step(model.module.apply, model.loss.train_loss,
                           sanitize=True)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((2, 10, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 24, 24]
    state, losses = step(state, images, jnp.asarray(labels), jax.random.key(0))
    assert float(losses["nonfinite_grads"]) == 0.0
    assert np.isfinite(float(losses["grad_norm"]))
    assert float(losses["grad_norm"]) > 0.0
