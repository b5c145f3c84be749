"""StableHLO export round trip (tools/export.py — the deploy artifact)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_stablehlo_export_roundtrip(tmp_path):
    from export import export_stablehlo
    from jax import export as jexport
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.ops.nms import postprocess

    cfg = {
        "backbone": {"name": "cspdarknet", "depths": [1, 1, 1, 1],
                     "channels": [8, 16, 32, 64, 128],
                     "outputs": ["stage2", "stage3", "stage4"],
                     "norm": "bn", "act": "silu"},
        "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
                 "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
        "head": {"name": "decoupled_head", "num_anchor": 1,
                 "channels": [32, 64, 128], "norm": "bn", "act": "silu"},
        "loss": {"name": "yolox", "stride": [8, 16, 32]},
        "optimizer": {"name": "SGD", "learning_rate": 0.01},
    }
    model = build_model(cfg, num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    out = tmp_path / "model.stablehlo"
    export_stablehlo(model, variables, str(out), batch=1, size=64,
                     platforms=("cpu",))
    assert out.stat().st_size > 1000

    # round trip: deserialize and run the exported artifact
    exported = jexport.deserialize(out.read_bytes())
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (1, 64, 64, 3)).astype(np.float32))
    boxes, scores, classes, valid = exported.call(variables, x)

    def direct(v, im):
        preds = model.loss.eval_decode(model.module.apply(v, im, False))
        return postprocess(preds, conf_threshold=0.25, iou_threshold=0.5)

    det = direct(variables, x)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(det.boxes),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(det.valid))
