"""Unit tests for the core layer library (SURVEY.md §4 'Unit')."""

import jax
import jax.numpy as jnp
import numpy as np

from pl_yolo_tpu.layers.blocks import (
    ConvBlock, CSPLayer, Focus, SPPBottleneck, SPPCSPC,
    max_pool_same, space_to_depth, upsample_nearest_2x,
)


def test_space_to_depth_matches_strided_slices():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    got = np.asarray(space_to_depth(jnp.asarray(x)))
    # reference Focus order (network_blocks.py:50-64): TL, BL, TR, BR
    tl = x[:, ::2, ::2, :]
    bl = x[:, 1::2, ::2, :]
    tr = x[:, ::2, 1::2, :]
    br = x[:, 1::2, 1::2, :]
    want = np.concatenate([tl, bl, tr, br], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_upsample_nearest_2x():
    x = np.random.default_rng(0).normal(size=(1, 4, 4, 2)).astype(np.float32)
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    want = x.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_array_equal(got, want)


def test_max_pool_same_shape_and_values():
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32)
    for ks in (5, 9, 13):
        y = np.asarray(max_pool_same(jnp.asarray(x), ks))
        assert y.shape == x.shape
    # hand-check a 3x3 window center
    y = np.asarray(max_pool_same(jnp.asarray(x), 3))
    assert np.isclose(y[0, 3, 3, 0], x[0, 2:5, 2:5, 0].max())


def _init_and_run(module, shape=(1, 32, 32, 8)):
    x = jnp.ones(shape, jnp.float32)
    variables = module.init(jax.random.key(0), x, False)
    return module.apply(variables, x, False), variables


def test_conv_block_shapes():
    y, _ = _init_and_run(ConvBlock(16, ksize=3, stride=2))
    assert y.shape == (1, 16, 16, 16)


def test_csp_layer_shapes():
    y, _ = _init_and_run(CSPLayer(16, num_bottle=2))
    assert y.shape == (1, 32, 32, 16)


def test_focus_halves_spatial():
    y, _ = _init_and_run(Focus(12, ksize=3), shape=(1, 64, 64, 3))
    assert y.shape == (1, 32, 32, 12)


def test_spp_shapes():
    y, _ = _init_and_run(SPPBottleneck(16))
    assert y.shape == (1, 32, 32, 16)
    y, _ = _init_and_run(SPPCSPC(16))
    assert y.shape == (1, 32, 32, 16)


def test_batchnorm_updates_stats_in_train_mode():
    m = ConvBlock(4, ksize=1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), x, True)
    _, updated = m.apply(variables, x, True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn"]["mean"]
    after = updated["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_focus_fused_equals_s2d_path():
    """The 6x6-s2 fused Focus stem is an exact reparameterization of
    space_to_depth + 3x3 conv: same param tree, same outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pl_yolo_tpu.layers.blocks import Focus

    x = jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (2, 16, 20, 3)).astype(np.float32))
    ref = Focus(8, ksize=3, stride=1, fused=False)
    fus = Focus(8, ksize=3, stride=1, fused=True)
    v_ref = ref.init(jax.random.key(0), x)
    v_fus = fus.init(jax.random.key(0), x)
    assert (jax.tree.structure(v_ref) == jax.tree.structure(v_fus))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_fus)))
    y_ref = ref.apply(v_ref, x)
    y_fus = fus.apply(v_ref, x)   # same params through the fused path
    assert y_ref.shape == y_fus.shape == (2, 8, 10, 8)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fus),
                               atol=1e-5)

    # r3: training routes through the s2d+3x3 formulation (the 6x6 wgrad
    # is the worst conv of the step — see Focus docstring); with norm off
    # the two paths must agree on the same params
    nref = Focus(8, ksize=3, stride=1, fused=True, norm="none")
    v = nref.init(jax.random.key(1), x)
    y_eval = nref.apply(v, x, False)   # fused 6x6-s2 path
    y_train = nref.apply(v, x, True)   # s2d + 3x3-s1 path
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_train),
                               atol=1e-5)


def test_conv1x1_dot_matches_nn_conv():
    """Conv1x1 (dot_general lowering, layers/blocks.py) must be numerically
    identical to nn.Conv with the SAME param tree (kernel [1,1,cin,cout] +
    bias) — checkpoints and fuse.py depend on the tree staying nn.Conv's."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from pl_yolo_tpu.layers.blocks import Conv1x1

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 6, 6, 16)),
                    jnp.float32)
    mod = Conv1x1(24, use_bias=True)
    v = mod.init(jax.random.key(0), x)
    assert v["params"]["kernel"].shape == (1, 1, 16, 24)
    assert v["params"]["bias"].shape == (24,)
    ref = nn.Conv(24, (1, 1), use_bias=True)
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x)), np.asarray(ref.apply(v, x)),
        rtol=1e-6, atol=1e-6)
    # grads agree too (the dot VJP is the whole point)
    def loss_dot(p):
        return jnp.sum(mod.apply(p, x) ** 2)

    def loss_conv(p):
        return jnp.sum(ref.apply(p, x) ** 2)

    g_dot = jax.grad(loss_dot)(v)
    g_conv = jax.grad(loss_conv)(v)
    for a, b in zip(jax.tree.leaves(g_dot), jax.tree.leaves(g_conv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
