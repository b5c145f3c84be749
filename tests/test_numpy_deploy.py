"""Runtime-independent deployment parity: the exported npz + pure-numpy
runtime (pl_yolo_tpu/deploy/numpy_infer.py) must reproduce the jax eval
forward — the environment's analogue of the reference's ONNX export +
onnxruntime demo parity (tools/export_onnx.py, tools/onnx_inference.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.deploy import numpy_infer as ni
from pl_yolo_tpu.models.detector import build_model

TINY = {
    "name": "tiny_np",
    "dtype": "float32",
    "backbone": {"name": "cspdarknet", "channels": [8, 16, 32, 64, 128],
                 "depths": [1, 2, 2, 1],
                 "outputs": ["stage2", "stage3", "stage4"]},
    "neck": {"name": "csppafpn", "channels": [32, 64, 128],
             "depths": [1, 1, 1, 1]},
    "head": {"name": "decoupled_head", "channels": [32, 64, 128]},
    "loss": {"name": "yolox", "stride": [8, 16, 32]},
}


def _export_and_run(cfg, tmp_path, size=64, num_classes=3):
    from tools.export_npz import export_npz

    model = build_model(dict(cfg), num_classes=num_classes)
    variables = model.init(jax.random.key(0), input_size=(size, size))
    out = str(tmp_path / "m.npz")
    export_npz(cfg, jax.device_get(variables), out, num_classes)

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (2, size, size, 3)).astype(np.float32)
    dev = np.asarray(model.loss.eval_decode(
        model.module.apply(variables, jnp.asarray(img), False)), np.float32)
    params, stats, meta = ni.load_npz(out)
    host = ni.forward(params, stats, img, meta)
    return dev, host


def test_npz_numpy_parity_yolox(tmp_path):
    dev, host = _export_and_run(TINY, tmp_path)
    assert dev.shape == host.shape
    np.testing.assert_allclose(host, dev, rtol=1e-3, atol=1e-4)


def test_npz_numpy_parity_depthwise(tmp_path):
    cfg = json.loads(json.dumps(TINY))
    cfg["backbone"]["depthwise"] = True
    cfg["neck"]["depthwise"] = True
    cfg["head"]["depthwise"] = True
    dev, host = _export_and_run(cfg, tmp_path)
    np.testing.assert_allclose(host, dev, rtol=1e-3, atol=1e-4)


def test_numpy_conv_matches_lax():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 11, 6)).astype(np.float32)
    for kh, stride, groups in [(1, 1, 1), (3, 1, 1), (3, 2, 1), (5, 2, 1),
                               (3, 1, 6), (3, 2, 2)]:
        k = rng.normal(size=(kh, kh, 6 // groups, 12)).astype(np.float32) * .1
        ref = jax.lax.conv_general_dilated(
            x, k, (stride, stride),
            [((kh - 1) // 2,) * 2] * 2, feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = ni.conv2d(x, k, stride=stride, groups=groups)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4,
                                   atol=1e-5)


def test_numpy_postprocess_matches_jax_semantics():
    """numpy greedy NMS keeps the same detections as ops/nms.py postprocess
    on a small random decode (same confidence rule, per-class suppression)."""
    from pl_yolo_tpu.ops.nms import postprocess as jax_post

    rng = np.random.default_rng(7)
    n, c = 40, 4
    xy = rng.uniform(40, 200, (1, n, 2))
    wh = rng.uniform(10, 60, (1, n, 2))
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    obj = rng.uniform(0, 1, (1, n, 1))
    cls = rng.uniform(0, 1, (1, n, c))
    preds = np.concatenate([boxes, obj, cls], -1).astype(np.float32)

    out_np = ni.postprocess(preds, conf_threshold=0.2, iou_threshold=0.5)[0]
    det = jax_post(jnp.asarray(preds), conf_threshold=0.2, iou_threshold=0.5)
    valid = np.asarray(det.valid[0])
    jb = np.asarray(det.boxes[0])[valid.astype(bool)]
    js = np.asarray(det.scores[0])[valid.astype(bool)]
    jc = np.asarray(det.classes[0])[valid.astype(bool)]
    assert out_np.shape[0] == jb.shape[0]
    order = np.argsort(-out_np[:, 4])
    out_np = out_np[order]
    jorder = np.argsort(-js)
    np.testing.assert_allclose(out_np[:, 4], js[jorder], rtol=1e-5)
    np.testing.assert_allclose(out_np[:, :4], jb[jorder], rtol=1e-4)
    np.testing.assert_array_equal(out_np[:, 5].astype(int), jc[jorder])
