"""Direct space-to-depth feed (augment -> Focus stem, PERF.md "remaining
nibbles"): device_augment(out_s2d=True) emits the stem's s2d layout and the
model consumes it under layers/blocks.py::stem_input_s2d(). Math must be
IDENTICAL to the NHWC path on both augment implementations (plain jnp and
the Pallas-interpret chw path) and through a full train step."""

import jax
import jax.numpy as jnp
import numpy as np

from pl_yolo_tpu.data.augment import AugmentConfig, device_augment, _chw_to_s2d
from pl_yolo_tpu.layers.blocks import Focus, space_to_depth, stem_input_s2d
from pl_yolo_tpu.ops.pallas.mosaic_pallas import to_chw
from pl_yolo_tpu.train.state import make_train_step

from .test_train import TINY_CFG, _make_state


def _batch(rng_seed=7, b=4, s=32, m=10):
    rng = np.random.default_rng(rng_seed)
    imgs = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
    labs = jnp.zeros((b, m, 5), jnp.float32).at[:, 0].set(
        jnp.array([1.0, s / 2, s / 2, s / 3, s / 3]))
    return imgs, labs


def test_chw_to_s2d_matches_space_to_depth():
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (2, 8, 8, 3)).astype(np.float32))
    assert bool(jnp.all(_chw_to_s2d(to_chw(x)) == space_to_depth(x)))


def test_augment_out_s2d_plain_path():
    cfg = AugmentConfig(max_labels=10, use_pallas=False)
    imgs, labs = _batch()
    o1, l1 = device_augment(jax.random.key(1), imgs, labs, cfg)
    o2, l2 = device_augment(jax.random.key(1), imgs, labs, cfg, out_s2d=True)
    assert o2.shape == (4, 16, 16, 12)
    assert bool(jnp.all(space_to_depth(o1) == o2.astype(jnp.float32)))
    assert bool(jnp.all(l1 == l2))


def test_augment_out_s2d_chw_pallas_path():
    cfg = AugmentConfig(max_labels=10, use_pallas="interpret")
    imgs, labs = _batch(8)
    o1, l1 = device_augment(jax.random.key(2), imgs, labs, cfg)
    o2, l2 = device_augment(jax.random.key(2), imgs, labs, cfg, out_s2d=True)
    assert bool(jnp.all(space_to_depth(o1) == o2.astype(jnp.float32)))
    assert bool(jnp.all(l1 == l2))


def test_focus_consumes_pre_s2d_input():
    """Focus under stem_input_s2d() on s2d input == plain Focus on NHWC;
    the flag is consume-once so a second Focus call is unaffected."""
    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32))
    focus = Focus(8, ksize=3)
    variables = focus.init(jax.random.key(0), x, True)

    y_ref = focus.apply(variables, x, True, mutable=["batch_stats"])[0]
    with stem_input_s2d():
        y_s2d = focus.apply(variables, space_to_depth(x), True,
                            mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_s2d),
                               rtol=1e-6, atol=1e-6)
    # flag consumed: the next call expects NHWC again
    y_after = focus.apply(variables, x, True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_after))


def test_train_step_parity_nhwc_vs_s2d():
    """Full train step: identical loss and updated params on both feeds."""
    model, state = _make_state(TINY_CFG, size=64)
    cfg = AugmentConfig(max_labels=10, use_pallas=False)
    imgs, labs = _batch(9, s=64)

    step_a = make_train_step(
        model.module.apply, model.loss.train_loss, donate=False,
        augment_fn=lambda r, i, l: device_augment(r, i, l, cfg))

    raw_apply = model.module.apply

    def s2d_apply(variables, images, train, **kw):
        with stem_input_s2d():
            return raw_apply(variables, images, train, **kw)

    step_b = make_train_step(
        s2d_apply, model.loss.train_loss, donate=False,
        augment_fn=lambda r, i, l: device_augment(r, i, l, cfg,
                                                  out_s2d=True))

    k = jax.random.key(4)
    sa, la = step_a(state, imgs, labs, k)
    sb, lb = step_b(state, imgs, labs, k)
    assert np.isfinite(float(la["loss"]))
    np.testing.assert_allclose(float(la["loss"]), float(lb["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
