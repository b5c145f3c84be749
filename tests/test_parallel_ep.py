"""Expert parallelism (EP): `parallel: {expert: N}` shards the MoE ViT
tower's expert weights over the 'expert' mesh axis via the ONE shared
sharding rule (parallel/mesh.py::shard_tp / ep_spec), and is numerically
verified — a dp2 x ep4 train step must produce the dp8 loss.

The MoE FFN itself (models/backbones/vit.py::moe_ffn) is an extension
beyond the reference (which ships no MoE): Switch-style top-1 routing with
fixed-capacity dense one-hot dispatch (MXU matmuls, fixed shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pl_yolo_tpu.models.backbones.vit import VisionTransformer, moe_ffn
from pl_yolo_tpu.parallel.mesh import ep_spec, make_mesh, shard_tp

MODEL_CFG = {
    "name": "tiny_vit_moe_ep",
    "dtype": "float32",
    "backbone": {"name": "vision_transformer", "embed_dim": 32,
                 "depth": 2, "num_heads": 2, "patch_size": 16,
                 "moe_experts": 4},
    "neck": {"name": "csppafpn", "channels": [16, 16, 32],
             "depths": [1, 1, 1, 1]},
    "head": {"name": "decoupled_head", "channels": [16, 16, 32]},
    "loss": {"name": "yolox"},
    "optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                  "weight_decay": 0.0005, "warmup_epochs": 0},
}


def _moe_params(key, E=4, d=8, m=16):
    ks = jax.random.split(key, 3)
    return {
        "moe_router": jax.random.normal(ks[0], (d, E)) * 0.1,
        "moe_w1": jax.random.normal(ks[1], (E, d, m)) * 0.1,
        "moe_b1": jnp.zeros((E, m)),
        "moe_w2": jax.random.normal(ks[2], (E, m, d)) * 0.1,
        "moe_b2": jnp.zeros((E, d)),
    }


def test_moe_ffn_matches_per_token_oracle():
    """Dense one-hot dispatch == route each kept token through its argmax
    expert's MLP scaled by the gate, zero for capacity-dropped tokens."""
    p = _moe_params(jax.random.key(0))
    E, d = 4, 8
    y = jax.random.normal(jax.random.key(1), (2, 6, d))
    out = np.asarray(moe_ffn(p, y, capacity_factor=1.25))

    n = 2 * 6
    C = -(-int(n * 1.25) // E)
    yt = np.asarray(y).reshape(n, d)
    logits = yt @ np.asarray(p["moe_router"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expert = probs.argmax(-1)
    gate = probs.max(-1)
    want = np.zeros((n, d), np.float32)
    count = np.zeros(E, int)
    for i in range(n):
        e = expert[i]
        if count[e] < C:
            h = np.asarray(jax.nn.gelu(
                yt[i] @ np.asarray(p["moe_w1"])[e] + np.asarray(p["moe_b1"])[e]))
            want[i] = gate[i] * (h @ np.asarray(p["moe_w2"])[e]
                                 + np.asarray(p["moe_b2"])[e])
        count[e] += 1
    np.testing.assert_allclose(out.reshape(n, d), want, rtol=1e-5, atol=1e-5)


def test_moe_ffn_drops_tokens_over_capacity():
    """With a router forced to send every token to expert 0, only the first
    C tokens produce output; the rest are zero (residual pass-through)."""
    p = _moe_params(jax.random.key(0))
    p["moe_router"] = jnp.zeros((8, 4)).at[:, 0].set(100.0)
    # positive features so every token's expert-0 logit is the max
    y = jnp.abs(jax.random.normal(jax.random.key(1), (1, 12, 8))) + 0.1
    out = np.asarray(moe_ffn(p, y, capacity_factor=0.5))[0]
    C = -(-int(12 * 0.5) // 4)  # = 2
    assert np.abs(out[:C]).sum() > 0
    np.testing.assert_allclose(out[C:], 0.0, atol=1e-7)


def test_moe_vit_forward_and_grad_flow():
    m = VisionTransformer(embed_dim=32, depth=2, num_heads=2, patch_size=16,
                          moe_experts=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    outs = m.apply(v, x)
    assert [o.shape[1] for o in outs] == [8, 4, 2]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)

    def loss(p):
        return sum(jnp.mean(o ** 2) for o in m.apply({"params": p}, x))

    g = jax.grad(loss)(v["params"])
    for k in ("blocks_moe_router", "blocks_moe_w1", "blocks_moe_w2"):
        assert float(jnp.sum(jnp.abs(g[k]))) > 0.0, k


def test_ep_spec_rules():
    w1 = np.zeros((2, 4, 8, 16))   # [L, E, d, m]
    b1 = np.zeros((2, 4, 16))      # [L, E, m]
    router = np.zeros((2, 8, 4))   # [L, d, E] — replicated
    conv = np.zeros((3, 3, 16, 32))
    path_w = (jax.tree_util.DictKey("blocks_moe_w1"),)
    path_b = (jax.tree_util.DictKey("blocks_moe_b1"),)
    path_r = (jax.tree_util.DictKey("blocks_moe_router"),)
    path_c = (jax.tree_util.DictKey("conv"),)
    assert ep_spec(path_w, w1, 4) == P(None, "expert")
    assert ep_spec(path_b, b1, 4) == P(None, "expert")
    assert ep_spec(path_r, router, 4) is None
    assert ep_spec(path_c, conv, 4) is None


def _run_one_step(mesh, images, labels):
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step

    model = build_model(dict(MODEL_CFG), num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    tx, _ = build_optimizer(MODEL_CFG["optimizer"], total_steps=10)
    state = TrainState.create(variables, tx)
    state = shard_tp(state, mesh)
    step = make_train_step(model.module.apply, model.loss.train_loss,
                           donate=False)
    from pl_yolo_tpu.parallel.mesh import batch_sharding
    imgs = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    labs = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
    with mesh:
        new_state, losses = step(state, imgs, labs, jax.random.key(1))
        jax.block_until_ready(losses["loss"])
    return new_state, losses


def test_dp8_equals_dp2_ep4_train_step():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((8, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]

    _, l_dp = _run_one_step(make_mesh(8), images, labels)
    _, l_ep = _run_one_step(make_mesh(data=2, expert=4), images, labels)
    a, b = float(l_dp["loss"]), float(l_ep["loss"])
    assert abs(a - b) <= 1e-3 * max(1.0, abs(b)), (a, b)
