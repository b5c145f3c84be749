"""Golden/parity regression tests (SURVEY.md §4 'Golden/parity'): fixed-seed
forward statistics of detector pipelines at two sizes. Values recorded on
CPU (the test platform); any change to init, layer math, or decode ordering
shows up here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.models.detector import build_model

PICO_X = {
    "backbone": {"name": "cspdarknet", "depths": [1, 1, 1, 1],
                 "channels": [8, 16, 32, 64, 128],
                 "outputs": ["stage2", "stage3", "stage4"]},
    "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1], "channels": [32, 64, 128]},
    "head": {"name": "decoupled_head", "num_anchor": 1, "channels": [32, 64, 128]},
    "loss": {"name": "yolox", "stride": [8, 16, 32]},
    "optimizer": {"name": "SGD", "learning_rate": 0.01},
}
PICO_7 = {
    "backbone": {"name": "eelan", "depths": [1, 1, 1, 1],
                 "channels": [8, 16, 32, 64, 64],
                 "outputs": ["stage2", "stage3", "stage4"]},
    "neck": {"name": "yolov7neck", "depths": [1, 1, 1, 1], "channels": [32, 64, 64]},
    "head": {"name": "implicit_head", "num_anchor": 3, "channels": [16, 32, 64]},
    "loss": {"name": "yolov7", "stride": [8, 16, 32]},
    "optimizer": {"name": "SGD", "learning_rate": 0.01},
}

# recorded goldens (CPU, jax 0.9, seed 42)
GOLDEN = {
    ("yolox_pico", 64): {"shape": (1, 84, 8), "mean": 13.348499,
                         "std": 19.141130, "box_mean": 26.6871},
    ("yolox_pico", 128): {"shape": (1, 336, 8), "mean": 29.343395,
                          "std": 39.510342, "box_mean": 58.6770},
    ("yolov7_pico", 64): {"shape": (1, 252, 8), "mean": 16.350676,
                          "std": 34.207825, "box_mean": 32.1964},
}
CFGS = {"yolox_pico": PICO_X, "yolov7_pico": PICO_7}


@pytest.mark.parametrize("name,size", sorted(GOLDEN))
def test_golden_forward_stats(name, size):
    model = build_model(CFGS[name], num_classes=3)
    v = model.init(jax.random.key(42), input_size=(size, size))
    x = jnp.asarray(
        np.random.default_rng(42).uniform(0, 255, (1, size, size, 3)),
        jnp.float32)
    dec = model.loss.eval_decode(model.module.apply(v, x, False))
    want = GOLDEN[(name, size)]
    assert tuple(dec.shape) == want["shape"]
    assert float(jnp.mean(dec)) == pytest.approx(want["mean"], rel=2e-3)
    assert float(jnp.std(dec)) == pytest.approx(want["std"], rel=2e-3)
    assert float(jnp.mean(dec[..., :4])) == pytest.approx(
        want["box_mean"], rel=2e-3)
