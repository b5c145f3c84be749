"""Label-axis-chunked SimOTA vs the dense path: identical assignments.

The chunked path (losses/yolox.py::_simota_assign_chunked) recomputes the
same cost rows chunk-by-chunk under a lax.scan and reconstructs the dense
path's conflict resolution from per-anchor accumulators — outputs must be
exactly equal (same fp ops per row, no reassociated reductions across the
match, strict-< running min replicates argmin-first semantics).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.models.losses.yolox import simota_assign, yolox_loss

from test_simota_pallas import _random_case


def _vmapped(chunk):
    return jax.vmap(
        functools.partial(simota_assign, chunk=chunk),
        in_axes=(0, 0, 0, 0, 0, 0, None, None, None))


@pytest.mark.parametrize("chunk", [3, 7, 10, 64])
def test_chunked_assign_equals_dense(chunk):
    rng = np.random.default_rng(21)
    args = _random_case(rng, b=3, m=20, c=7)
    want = _vmapped(None)(*args)
    got = _vmapped(chunk)(*args)
    np.testing.assert_array_equal(np.asarray(want.fg_mask),
                                  np.asarray(got.fg_mask))
    fg = np.asarray(want.fg_mask)
    np.testing.assert_array_equal(np.asarray(want.matched_gt)[fg],
                                  np.asarray(got.matched_gt)[fg])
    np.testing.assert_allclose(np.asarray(want.pred_ious)[fg],
                               np.asarray(got.pred_ious)[fg], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(want.num_fg),
                                  np.asarray(got.num_fg))
    np.testing.assert_array_equal(np.asarray(want.num_gt),
                                  np.asarray(got.num_gt))


def test_chunked_assign_no_gt_image():
    rng = np.random.default_rng(5)
    args = list(_random_case(rng, b=2, m=10, c=7))
    gval = np.asarray(args[2]).copy()
    gval[0, :] = False  # image 0 has zero gts
    args[2] = jnp.asarray(gval)
    want = _vmapped(None)(*args)
    got = _vmapped(4)(*args)
    np.testing.assert_array_equal(np.asarray(want.fg_mask),
                                  np.asarray(got.fg_mask))
    assert not np.asarray(got.fg_mask)[0].any()
    np.testing.assert_array_equal(np.asarray(want.num_fg),
                                  np.asarray(got.num_fg))


def test_yolox_loss_assign_chunk_matches():
    """Full loss with loss:{assign_chunk:N} == dense, values AND gradients."""
    rng = np.random.default_rng(9)
    b, c = 2, 7
    size = 64
    outputs = [
        jnp.asarray(rng.normal(0, 1, (b, size // s, size // s, 5 + c))
                    .astype(np.float32))
        for s in (8, 16, 32)
    ]
    labels = np.zeros((b, 12, 5), np.float32)
    for i in range(b):
        n = int(rng.integers(2, 10))
        labels[i, :n, 0] = rng.integers(0, c, n)
        labels[i, :n, 1] = rng.uniform(8, size - 8, n)
        labels[i, :n, 2] = rng.uniform(8, size - 8, n)
        labels[i, :n, 3:] = rng.uniform(6, 30, (n, 2))
    labels = jnp.asarray(labels)

    def loss_fn(outs, chunk):
        return yolox_loss(outs, labels, num_classes=c, use_l1=True,
                          assign_chunk=chunk)["loss"]

    dense, g_dense = jax.value_and_grad(loss_fn)(outputs, None)
    chunked, g_chunk = jax.value_and_grad(loss_fn)(outputs, 5)
    np.testing.assert_allclose(float(dense), float(chunked), rtol=1e-6)
    for gd, gc in zip(g_dense, g_chunk):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gc),
                                   atol=1e-6, rtol=1e-5)
