"""Attention zoo tests: every plug-in preserves shape and is finite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.layers.attention import ATTENTION, SKFF, build_attention


@pytest.mark.parametrize("name", sorted(set(ATTENTION) - {"skff"}))
def test_attention_preserves_shape(name):
    m = build_attention(name)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_skff_fuses_branches():
    m = SKFF()
    feats = [jnp.ones((1, 4, 4, 8)), 2 * jnp.ones((1, 4, 4, 8))]
    v = m.init(jax.random.key(0), feats)
    y = m.apply(v, feats)
    assert y.shape == (1, 4, 4, 8)
    # output between the branch values (softmax-weighted mean)
    assert 1.0 <= float(y.mean()) <= 2.0


def test_build_attention_none_and_unknown():
    assert build_attention(None) is None
    assert build_attention("none") is None
    with pytest.raises(KeyError):
        build_attention("nope")
