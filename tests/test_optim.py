"""Optimizer factory extras: gradient clipping + accumulation (the two
Lightning-Trainer capabilities of the reference's L6 host — gradient_clip_val
/ accumulate_grad_batches — exposed as `optimizer:` yaml keys, optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pl_yolo_tpu.train.optim import build_optimizer


def _params():
    return {"w": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros((8,))}}


def test_clip_grad_norm():
    cfg = {"name": "sgd", "learning_rate": 0.1, "momentum": 0.0,
           "weight_decay": 0.0, "warmup": 0, "clip_grad_norm": 1.0}
    tx, sched = build_optimizer(cfg, total_steps=100)
    params = _params()
    st = tx.init(params)
    grads = jax.tree.map(lambda p: 100.0 * jnp.ones_like(p), params)
    updates, _ = tx.update(grads, st, params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(u ** 2)
                               for u in jax.tree.leaves(updates))))
    lr0 = float(sched(0))
    # clipped to global norm 1.0, then scaled by -lr
    np.testing.assert_allclose(gnorm, lr0 * 1.0, rtol=1e-5)


def test_accumulate_steps_averages_grads():
    cfg = {"name": "sgd", "learning_rate": 0.1, "momentum": 0.0,
           "weight_decay": 0.0, "warmup": 0, "accumulate_steps": 2}
    tx, _ = build_optimizer(cfg, total_steps=100)
    params = _params()
    st = tx.init(params)
    g1 = jax.tree.map(lambda p: 1.0 * jnp.ones_like(p), params)
    g2 = jax.tree.map(lambda p: 3.0 * jnp.ones_like(p), params)

    u1, st = tx.update(g1, st, params)
    # mid-accumulation: no update applied
    assert all(float(jnp.max(jnp.abs(u))) == 0.0
               for u in jax.tree.leaves(u1))
    u2, st = tx.update(g2, st, params)
    # the real update uses the MEAN of the micro-batch grads
    ref_cfg = dict(cfg, accumulate_steps=1)
    ref_tx, _ = build_optimizer(ref_cfg, total_steps=50)
    gm = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    ur, _ = ref_tx.update(gm, ref_tx.init(params), params)
    for a, b in zip(jax.tree.leaves(u2), jax.tree.leaves(ur)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_accumulate_schedule_horizon():
    # the cosine horizon shrinks to total_steps/accum so it still lands at
    # its floor on the final micro-batch
    cfg = {"name": "sgd", "learning_rate": 0.1, "warmup": 0}
    _, s1 = build_optimizer(cfg, total_steps=100)
    _, s4 = build_optimizer(dict(cfg, accumulate_steps=4), total_steps=100)
    np.testing.assert_allclose(float(s4(25)), float(s1(100)), rtol=1e-6)


def test_accumulate_works_in_train_state():
    # MultiSteps' opt_state (acc buffer etc.) flows through TrainState and
    # the zero_spec path rule without special-casing
    import optax
    from pl_yolo_tpu.train.state import TrainState
    cfg = {"name": "sgd", "learning_rate": 0.1, "accumulate_steps": 2,
           "warmup": 0}
    tx, _ = build_optimizer(cfg, total_steps=100)
    st = TrainState.create({"params": _params()}, tx)
    assert isinstance(st.opt_state, optax.MultiStepsState)
    from jax.sharding import PartitionSpec as P
    from pl_yolo_tpu.parallel.mesh import make_mesh, state_specs
    mesh = make_mesh()
    specs = state_specs(st, mesh, zero=True)
    assert any(isinstance(s, P) and "data" in tuple(s)
               for s in jax.tree.leaves(specs.opt_state))
