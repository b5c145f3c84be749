"""Backbone zoo shape tests (golden shape contract per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import pytest

from pl_yolo_tpu.models.backbones.mobile import CSPMobileNext, ECMNet, MobileNetV3
from pl_yolo_tpu.models.backbones.shufflenetv2 import ShuffleNetV2
from pl_yolo_tpu.models.backbones.swin import SwinTransformer
from pl_yolo_tpu.models.backbones.vit import VisionTransformer
from pl_yolo_tpu.models.necks.pafpn_al import AL_PAFPN


def _run(module, size=64, ch=3):
    x = jnp.ones((1, size, size, ch))
    v = module.init(jax.random.key(0), x, False)
    return module.apply(v, x, False)


def test_cspmobilenext_shapes():
    outs = _run(CSPMobileNext(depths=(1, 1, 1, 1), channels=(8, 16, 32, 64, 128)))
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_ecmnet_shapes():
    outs = _run(ECMNet(depths=(1, 1, 1, 1), channels=(8, 16, 32, 64, 128)))
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


@pytest.mark.parametrize("size,chans", [("small", (24, 48, 96)),
                                        ("large", (40, 80, 160))])
def test_mobilenetv3_shapes(size, chans):
    outs = _run(MobileNetV3(size=size), size=128)
    assert [o.shape[-1] for o in outs] == list(chans)
    assert [o.shape[1] for o in outs] == [16, 8, 4]  # strides 8/16/32


def test_shufflenetv2_shapes():
    outs = _run(ShuffleNetV2(channels=(24, 48, 96, 192)), size=128)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 16, 48), (1, 8, 8, 96), (1, 4, 4, 192)]


def test_swin_multiscale_shapes():
    m = SwinTransformer(embed_dim=32, depths=(1, 1, 2, 1),
                        num_heads=(1, 2, 4, 8), window_size=4,
                        out_indices=(0, 1, 2, 3))
    outs = _run(m, size=64)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 256)]


def test_swin_shifted_window_mask_changes_output():
    # depths>=2 exercises the shifted (SW-MSA) path
    m = SwinTransformer(embed_dim=16, depths=(2,), num_heads=(2,),
                        window_size=4, out_indices=(0,))
    outs = _run(m, size=32)
    assert outs[0].shape == (1, 8, 8, 16)


def test_vit_pyramid_shapes():
    m = VisionTransformer(embed_dim=32, depth=2, num_heads=2, patch_size=16)
    outs = _run(m, size=64)
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 32)]


def test_al_pafpn_shapes():
    m = AL_PAFPN(depths=(1, 1, 1, 1), in_channels=(16, 32, 64))
    c3 = jnp.ones((1, 16, 16, 16))
    c4 = jnp.ones((1, 8, 8, 32))
    c5 = jnp.ones((1, 4, 4, 64))
    v = m.init(jax.random.key(0), (c3, c4, c5), False)
    n3, n4, n5 = m.apply(v, (c3, c4, c5), False)
    assert n3.shape == (1, 16, 16, 16)
    assert n4.shape == (1, 8, 8, 32)
    assert n5.shape == (1, 4, 4, 64)


def test_swin_neck_none_detector_builds():
    """Swin + neck none + 4-level decoupled head + strides [4,8,16,32]
    (reference swin_transformer_tiny.yaml)."""
    from pl_yolo_tpu.models.detector import build_model
    cfg = {
        "backbone": {"name": "swin_transformer", "embed_dim": 16,
                     "depths": [1, 1, 1, 1], "num_heads": [1, 2, 4, 8],
                     "window_size": 4, "out_indices": [0, 1, 2, 3]},
        "neck": {"name": "none"},
        "head": {"name": "decoupled_head", "num_anchor": 1,
                 "channels": [16, 32, 64, 128], "norm": "bn", "act": "silu"},
        "loss": {"name": "yolox", "stride": [4, 8, 16, 32]},
        "optimizer": {"name": "SGD", "learning_rate": 0.01},
    }
    model = build_model(cfg, num_classes=4)
    v = model.init(jax.random.key(0), input_size=(64, 64))
    outs = model.module.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert len(outs) == 4
    dec = model.loss.eval_decode(outs)
    assert dec.shape == (1, 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2, 9)


def test_swin_drop_path_stochastic_depth():
    """drop_path_rate engages only in train mode, through the 'dropout' rng
    collection (reference swin stochastic depth, swin_transformer.py:529)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pl_yolo_tpu.models.backbones.swin import SwinTransformer

    m = SwinTransformer(embed_dim=24, depths=(1, 1), num_heads=(2, 4),
                        out_indices=(0, 1), drop_path_rate=0.9)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (4, 56, 56, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x)
    # eval: deterministic, no dropout rng required
    e1 = m.apply(v, x, False)
    e2 = m.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(e1[-1]), np.asarray(e2[-1]))
    # train: different dropout keys give different outputs
    t1 = m.apply(v, x, True, rngs={"dropout": jax.random.key(1)})
    t2 = m.apply(v, x, True, rngs={"dropout": jax.random.key(2)})
    assert np.abs(np.asarray(t1[-1]) - np.asarray(t2[-1])).max() > 1e-3


def test_swinv2_backbone_forward():
    """SwinV2 (cosine attention + post-norm + continuous rel-pos bias)
    produces the detection pyramid like V1."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pl_yolo_tpu.models.backbones.swinv2 import SwinTransformerV2

    m = SwinTransformerV2(embed_dim=24, depths=(1, 1, 1), num_heads=(2, 4, 4),
                          out_indices=(0, 1, 2), drop_path_rate=0.1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 112, 112, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0)}, x)
    outs = m.apply(v, x, False)
    assert [o.shape for o in outs] == [(2, 28, 28, 24), (2, 14, 14, 48),
                                       (2, 7, 7, 96)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    # train mode with stochastic depth runs through the dropout rng
    t = m.apply(v, x, True, rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(t[-1])).all()


def test_restv2_pyramid_shapes():
    from pl_yolo_tpu.models.backbones.restv2 import ResTV2
    m = ResTV2(depths=(1, 1, 1, 1), embed_dims=(16, 32, 64, 128),
               num_heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1),
               outputs=("stage2", "stage3", "stage4"))
    outs = _run(m, size=64)
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]
    for o in outs:
        assert jnp.isfinite(o).all()


def test_restv2_trains_one_step():
    import numpy as np
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step

    cfg = {
        "backbone": {"name": "restv2", "depths": [1, 1, 1, 1],
                     "embed_dims": [16, 32, 64, 128],
                     "num_heads": [1, 2, 4, 8],
                     "drop_path_rate": 0.1},
        "neck": {"name": "csppafpn", "channels": [32, 64, 128],
                 "depths": [1, 1, 1, 1]},
        "head": {"name": "decoupled_head", "channels": [32, 64, 128]},
        "loss": {"name": "yolox"},
        "optimizer": {"name": "sgd", "lr": 0.01},
    }
    model = build_model(cfg, num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=10)
    state = TrainState.create(variables, tx)
    step = make_train_step(model.module.apply, model.loss.train_loss,
                           donate=False)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    labels = np.zeros((2, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    new_state, losses = step(state, images, jnp.asarray(labels),
                             jax.random.key(1))
    assert np.isfinite(float(losses["loss"]))
    # parameters actually moved (drop-path rng threaded, grads flow)
    delta = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in
                zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)))
    assert delta > 1e-3, delta


def test_mctformer_pyramid_and_classify():
    import numpy as np
    from pl_yolo_tpu.models.backbones.mctformer import MCTformer

    m = MCTformer(num_classes=5, embed_dim=32, depth=2, num_heads=2,
                  patch_size=16)
    x = jnp.ones((2, 64, 64, 3))
    v = m.init(jax.random.key(0), x, False)
    outs = m.apply(v, x, False)
    assert [tuple(o.shape) for o in outs] == [
        (2, 8, 8, 16), (2, 4, 4, 32), (2, 2, 2, 32)]

    # classify path: class logits from class tokens, CAMs fused with the
    # patch head (reference MCTformerV2.forward :70-108)
    vc = m.init(jax.random.key(0), x, method=MCTformer.classify)
    cls_logits, patch_logits, cams = m.apply(vc, x,
                                             method=MCTformer.classify)
    assert cls_logits.shape == (2, 5)
    assert patch_logits.shape == (2, 5)
    assert cams.shape == (2, 4, 4, 5)
    assert np.isfinite(np.asarray(cams)).all()
    assert float(jnp.abs(cams).sum()) >= 0.0


def test_cspdarknet_dropblock_wiring():
    """DropBlock (VERDICT r2 #6): active in train mode, identity in eval."""
    import numpy as np
    from pl_yolo_tpu.models.backbones.cspdarknet import CSPDarkNet

    m = CSPDarkNet(depths=(1, 1, 1, 1), channels=(8, 16, 32, 64, 128),
                   drop_block_rate=0.3, drop_block_size=3)
    x = jnp.ones((2, 64, 64, 3))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
               x, True)
    # eval: deterministic, no dropout rng needed, repeated calls identical
    e1 = m.apply(v, x, False)
    e2 = m.apply(v, x, False)
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train: stochastic masking changes the output vs eval and across rngs
    t1, _ = m.apply(v, x, True, rngs={"dropout": jax.random.key(2)},
                    mutable=["batch_stats"])
    t2, _ = m.apply(v, x, True, rngs={"dropout": jax.random.key(3)},
                    mutable=["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(t1, e1))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(t1, t2))
