"""Pipeline parallelism (parallel/pipeline.py): a GPipe shard_map/ppermute
pipeline must be EXACTLY the sequential composition of its stages — forward
and gradients — and compose with data parallelism on one mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pl_yolo_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _mlp_stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _init_mlp_stages(s, dim, key):
    trees = []
    for i in range(s):
        k1, k2, key = jax.random.split(key, 3)
        trees.append({"w": jax.random.normal(k1, (dim, dim)) / np.sqrt(dim),
                      "b": 0.01 * jax.random.normal(k2, (dim,))})
    return trees


def _sequential(trees, x):
    for p in trees:
        x = _mlp_stage(p, x)
    return x


def test_pp_forward_matches_sequential():
    assert len(jax.devices()) >= 4
    mesh = _mesh((4,), ("pipe",))
    trees = _init_mlp_stages(4, 16, jax.random.key(0))
    stacked = stack_stage_params(trees)
    x = jax.random.normal(jax.random.key(1), (8, 16))

    y_ref = _sequential(trees, x)
    y_pp = pipeline_apply(_mlp_stage, stacked, x, mesh=mesh, microbatches=4)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    # more microbatches than stages (smaller bubble) is still exact
    y_pp8 = pipeline_apply(_mlp_stage, stacked, x, mesh=mesh, microbatches=8)
    np.testing.assert_allclose(np.asarray(y_pp8), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_pp_gradients_match_sequential():
    assert len(jax.devices()) >= 4
    mesh = _mesh((4,), ("pipe",))
    trees = _init_mlp_stages(4, 16, jax.random.key(2))
    stacked = stack_stage_params(trees)
    x = jax.random.normal(jax.random.key(3), (8, 16))
    tgt = jax.random.normal(jax.random.key(4), (8, 16))

    def loss_pp(params):
        y = pipeline_apply(_mlp_stage, params, x, mesh=mesh, microbatches=4)
        return jnp.mean((y - tgt) ** 2)

    def loss_ref(params):
        y = _sequential([jax.tree.map(lambda p: p[i], params)
                         for i in range(4)], x)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pp_composes_with_dp():
    assert len(jax.devices()) >= 8
    mesh = _mesh((2, 4), ("data", "pipe"))
    trees = _init_mlp_stages(4, 16, jax.random.key(5))
    stacked = stack_stage_params(trees)
    x = jax.random.normal(jax.random.key(6), (16, 16))

    y_ref = _sequential(trees, x)
    y_pp = pipeline_apply(_mlp_stage, stacked, x, mesh=mesh,
                          microbatches=4, batch_axis="data")
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_pp_transformer_tower():
    """Real model blocks: a 4-deep TransformerLayer tower (the ViT/MCTformer
    block shape) pipelined over 4 devices reproduces the sequential stack,
    gradients included."""
    assert len(jax.devices()) >= 4
    from pl_yolo_tpu.layers.transformer import TransformerLayer

    mesh = _mesh((4,), ("pipe",))
    layer = TransformerLayer(dim=32, num_heads=4)
    x = jax.random.normal(jax.random.key(7), (8, 6, 32))
    trees = [layer.init(jax.random.key(10 + i), x)["params"]
             for i in range(4)]
    stacked = stack_stage_params(trees)

    def stage(p, xm):
        return layer.apply({"params": p}, xm)

    def seq(params):
        y = x
        for i in range(4):
            y = stage(jax.tree.map(lambda q: q[i], params), y)
        return y

    y_ref = seq(stacked)
    y_pp = pipeline_apply(stage, stacked, x, mesh=mesh, microbatches=4)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

    def loss_pp(params):
        return jnp.mean(pipeline_apply(stage, params, x, mesh=mesh,
                                       microbatches=4) ** 2)

    def loss_ref(params):
        return jnp.mean(seq(params) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
