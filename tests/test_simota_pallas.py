"""Fused SimOTA kernel vs the vmapped jnp path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.models.losses.yolox import simota_assign
from pl_yolo_tpu.ops.pallas.simota_pallas import simota_assign_pallas


def _random_case(rng, b=2, m=10, c=7, size=128):
    """Synthetic anchors (2-level grid) + random gts, like a tiny decode."""
    xs, ys, st = [], [], []
    for stride in (8, 16):
        g = size // stride
        gy, gx = np.mgrid[0:g, 0:g]
        xs.append(gx.reshape(-1))
        ys.append(gy.reshape(-1))
        st.append(np.full(g * g, stride, np.float32))
    xs = np.concatenate(xs).astype(np.float32)
    ys = np.concatenate(ys).astype(np.float32)
    st = np.concatenate(st)
    a = xs.shape[0]

    gt = np.zeros((b, m, 4), np.float32)
    gcls = rng.integers(0, c, (b, m)).astype(np.int32)
    gval = np.zeros((b, m), bool)
    for i in range(b):
        n = int(rng.integers(1, m))
        gval[i, :n] = True
        gt[i, :n, 0] = rng.uniform(10, size - 10, n)
        gt[i, :n, 1] = rng.uniform(10, size - 10, n)
        gt[i, :n, 2:] = rng.uniform(8, 60, (n, 2))
    preds = np.zeros((b, a, 4), np.float32)
    preds[..., 0] = (xs + rng.uniform(-1, 1, (b, a))) * st
    preds[..., 1] = (ys + rng.uniform(-1, 1, (b, a))) * st
    preds[..., 2:] = rng.uniform(4, 80, (b, a, 2))
    obj = rng.normal(-2, 2, (b, a)).astype(np.float32)
    cls = rng.normal(-2, 2, (b, a, c)).astype(np.float32)
    return (jnp.asarray(gt), jnp.asarray(gcls), jnp.asarray(gval),
            jnp.asarray(preds), jnp.asarray(obj), jnp.asarray(cls),
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(st))


def test_simota_kernel_matches_jnp():
    rng = np.random.default_rng(13)
    args = _random_case(rng)
    want = jax.vmap(
        simota_assign, in_axes=(0, 0, 0, 0, 0, 0, None, None, None))(*args)
    fg, matched, piou = simota_assign_pallas(*args, interpret=True)

    fg_ref = np.asarray(want.fg_mask)
    fg_got = np.asarray(fg)
    # transcendental-ulp cost differences can flip exact threshold ties on
    # random data; demand near-perfect agreement rather than bit equality
    agree = (fg_ref == fg_got).mean()
    assert agree > 0.999, agree
    both = fg_ref & fg_got
    np.testing.assert_array_equal(np.asarray(want.matched_gt)[both],
                                  np.asarray(matched)[both])
    np.testing.assert_allclose(np.asarray(want.pred_ious)[both],
                               np.asarray(piou)[both], atol=1e-5)
    # foreground counts match to the tie-flip budget
    assert abs(fg_ref.sum() - fg_got.sum()) <= 2


def test_loss_config_pallas_assign_parity():
    """loss: {pallas_assign: true} (detector-level wiring of the fused
    kernel, interpret mode on CPU) produces the identical loss dict to the
    production jnp assignment."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_numpy_deploy import TINY

    from pl_yolo_tpu.models.detector import build_model

    cfg = dict(TINY)
    cfg["loss"] = dict(cfg["loss"])
    model_a = build_model(cfg, num_classes=3)
    cfg_b = dict(cfg)
    cfg_b["loss"] = dict(cfg["loss"], pallas_assign=True)
    model_b = build_model(cfg_b, num_classes=3)

    variables = model_a.init(jax.random.key(0), input_size=(64, 64))
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32))
    labels = np.zeros((2, 10, 5), np.float32)
    labels[0, 0] = [1, 32, 32, 24, 24]
    labels[1, 0] = [2, 16, 48, 12, 20]
    outs = model_a.module.apply(variables, img, False)
    la = model_a.loss.train_loss(outs, jnp.asarray(labels))
    lb = model_b.loss.train_loss(outs, jnp.asarray(labels))
    for k in la:
        assert float(la[k]) == pytest.approx(float(lb[k]), abs=1e-5), k
