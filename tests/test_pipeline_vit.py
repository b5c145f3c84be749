"""End-to-end pipeline parallelism on the ViT backbone: the
`parallel: {pipeline: N}` path (trainer.py -> mesh.py::use_pipeline_mesh ->
models/backbones/vit.py tower -> parallel/pipeline.py) must be numerically
equivalent to the sequential tower through a FULL detector train step.

The reference has no distributed layer (SURVEY §2.6); this covers the
TPU-native PP design on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.models.detector import build_model
from pl_yolo_tpu.parallel.mesh import (make_mesh, pipeline_mesh, shard_batch,
                                       use_pipeline_mesh)
from pl_yolo_tpu.train.optim import build_optimizer
from pl_yolo_tpu.train.state import TrainState, make_train_step

VIT_CFG = {
    "backbone": {"name": "vision_transformer", "embed_dim": 32, "depth": 4,
                 "num_heads": 2, "patch_size": 16},
    "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
             "channels": [16, 16, 32], "norm": "bn", "act": "silu"},
    "head": {"name": "decoupled_head", "num_anchor": 1,
             "channels": [16, 16, 32], "norm": "bn", "act": "silu"},
    "loss": {"name": "yolox", "stride": [8, 16, 32]},
    "optimizer": {"name": "SGD", "learning_rate": 0.02, "momentum": 0.9,
                  "weight_decay": 0.0005, "warmup": 0.05, "ema": True},
}


def _batch(b=8, size=64):
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(0, 1, (b, size, size, 3)), jnp.float32)
    labels = np.zeros((b, 10, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 24, 24]
    labels[:, 1] = [0, 16, 44, 10, 18]
    return images, jnp.asarray(labels)


def test_vit_tower_pp_forward_matches_sequential():
    m = build_model(VIT_CFG, num_classes=3).module.backbone
    images, _ = _batch()
    v = m.init(jax.random.key(0), images)
    ref = m.apply(v, images)
    mesh = make_mesh(data=2, pipe=4)
    with use_pipeline_mesh(mesh):
        assert pipeline_mesh() is mesh
        pp = jax.jit(lambda v, x: m.apply(v, x))(v, images)
    assert pipeline_mesh() is None
    for a, b in zip(ref, pp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_vit_pp_train_step_matches_dp():
    """Two full train steps (aug-less) with the tower pipelined over
    dp2 x pp4 must match the dp8 sequential run: same losses at step 1 AND
    step 2 (step 2 sees the step-1 update, so gradient equivalence is
    covered too)."""
    model = build_model(VIT_CFG, num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    tx, _ = build_optimizer(VIT_CFG["optimizer"], total_steps=10)
    images, labels = _batch()

    def run(mesh, apply_fn):
        state = TrainState.create(variables, tx)
        step = make_train_step(apply_fn, model.loss.train_loss, donate=False)
        batch = shard_batch(mesh, {"images": images, "labels": labels})
        out = []
        with mesh:
            for i in range(2):
                state, losses = step(state, batch["images"],
                                     batch["labels"], jax.random.key(i))
                out.append(float(losses["loss"]))
        return out

    seq = run(make_mesh(), model.module.apply)

    mesh_pp = make_mesh(data=2, pipe=4)
    raw = model.module.apply

    def pp_apply(v, x, train, **kw):
        with use_pipeline_mesh(mesh_pp):
            return raw(v, x, train, **kw)

    pp = run(mesh_pp, pp_apply)
    np.testing.assert_allclose(seq, pp, rtol=5e-4)
    assert all(np.isfinite(pp))


def test_trainer_rejects_pipeline_on_conv_backbone(tmp_path):
    """parallel.pipeline on a non-tower backbone must be a hard config
    error, not a silent fallback."""
    from synthetic_coco import make_coco

    from pl_yolo_tpu.train.trainer import Trainer

    root = make_coco(tmp_path / "coco", num_images=2)
    data_cfg = {
        "name": "synthetic", "datamodule": "coco",
        "dataset": {
            "dir": str(root), "train": "images",
            "train_json": "annotations/instances.json",
            "val": "images", "val_json": "annotations/instances.json",
            "train_size": [64, 64], "val_size": [64, 64],
            "train_batch_size": 8, "val_batch_size": 2,
        },
        "transform": {"mosaic_prob": 0.0, "mixup_prob": 0.0,
                      "hsv_prob": 0.0, "flip_prob": 0.0},
        "num_classes": 3, "classes": ["class0", "class1", "class2"],
    }
    cfg = {**VIT_CFG, "parallel": {"pipeline": 2},
           "backbone": {"name": "cspdarknet", "depths": [1, 1, 1, 1],
                        "channels": [8, 16, 32, 64, 128],
                        "outputs": ["stage2", "stage3", "stage4"],
                        "norm": "bn", "act": "silu"}}
    with pytest.raises(ValueError, match="PIPELINE_TOWER"):
        Trainer(cfg, data_cfg, max_epochs=1,
                output_dir=str(tmp_path / "runs"), logger="csv")


def test_vit_pp_depth_divisibility_error():
    m = build_model(VIT_CFG, num_classes=3).module.backbone
    images, _ = _batch()
    v = m.init(jax.random.key(0), images)
    mesh = make_mesh(data=1, pipe=8)  # depth 4 % 8 != 0
    with use_pipeline_mesh(mesh):
        with pytest.raises(ValueError, match="divide ViT depth"):
            jax.jit(lambda v, x: m.apply(v, x))(v, images)


def test_mctformer_tower_pp_forward_matches_sequential():
    """MCTformer's stacked tower (PIPELINE_TOWER) pipelines for the
    detection path; classify (needs per-layer attention) stays sequential
    and still works with the same params."""
    import jax.numpy as jnp

    from pl_yolo_tpu.models.backbones.mctformer import MCTformer

    m = MCTformer(num_classes=5, embed_dim=32, depth=4, num_heads=2,
                  patch_size=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64, 64, 3)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    ref = m.apply(v, x)
    mesh = make_mesh(data=2, pipe=4)
    with use_pipeline_mesh(mesh):
        pp = jax.jit(lambda v, x: m.apply(v, x))(v, x)
        # classify ignores the pipe mesh (sequential scan) — same params
        vc = m.init(jax.random.key(0), x, method=MCTformer.classify)
        cl, pl, cams = m.apply(vc, x, method=MCTformer.classify)
    for a, b in zip(ref, pp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    assert cams.shape == (8, 4, 4, 5) and bool(jnp.all(jnp.isfinite(cams)))
