"""YOLOv5-family deployment parity (cspdarknet + csppafpn + simple_head +
anchor decode — BASELINE config #3's model): npz/numpy, clean-room ONNX,
and TorchScript, mirroring tests/test_deploy_v7.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.deploy import numpy_infer as ni
from pl_yolo_tpu.models.detector import build_model

TINY_V5 = {
    "name": "tiny_v5",
    "dtype": "float32",
    "backbone": {"name": "cspdarknet", "channels": [8, 16, 32, 64, 128],
                 "depths": [1, 2, 2, 1],
                 "outputs": ["stage2", "stage3", "stage4"]},
    "neck": {"name": "csppafpn", "channels": [32, 64, 128],
             "depths": [1, 1, 1, 1]},
    "head": {"name": "simple_head", "num_anchor": 3,
             "channels": [32, 64, 128]},
    "loss": {"name": "yolov5", "stride": [8, 16, 32],
             "anchors": [[[6, 8], [10, 12], [16, 14]],
                         [[18, 30], [30, 24], [28, 52]],
                         [[40, 36], [48, 60], [60, 50]]]},
}


def _export_and_run(cfg, tmp_path, size=64, num_classes=3):
    from tools.export_npz import export_npz

    model = build_model(dict(cfg), num_classes=num_classes)
    variables = model.init(jax.random.key(0), input_size=(size, size))
    out = str(tmp_path / "m.npz")
    export_npz(cfg, jax.device_get(variables), out, num_classes)

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 255, (2, size, size, 3)).astype(np.float32)
    dev = np.asarray(model.loss.eval_decode(
        model.module.apply(variables, jnp.asarray(img), False)), np.float32)
    params, stats, meta = ni.load_npz(out)
    host = ni.forward(params, stats, img, meta)
    return dev, host, (img, out)


def test_npz_numpy_parity_yolov5(tmp_path):
    dev, host, _ = _export_and_run(TINY_V5, tmp_path)
    assert dev.shape == host.shape
    np.testing.assert_allclose(host, dev, rtol=1e-3, atol=1e-4)


def test_onnx_numpy_runtime_parity_yolov5(tmp_path):
    from pl_yolo_tpu.deploy.onnx_export import export_onnx
    from pl_yolo_tpu.deploy.onnx_numpy_runtime import OnnxModel

    dev, _, (img, out) = _export_and_run(TINY_V5, tmp_path)
    params, stats, meta = ni.load_npz(out)
    model_bytes = export_onnx(params, stats, meta, batch=2, size=64)
    got = OnnxModel(model_bytes).run({"images": np.ascontiguousarray(
        img.transpose(0, 3, 1, 2))})["predictions"]
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)


def test_torchscript_parity_yolov5(tmp_path):
    torch = pytest.importorskip("torch")
    from pl_yolo_tpu.deploy.torch_infer import build_torch_model

    dev, _, (img, out) = _export_and_run(TINY_V5, tmp_path)
    params, stats, meta = ni.load_npz(out)
    tm = build_torch_model(params, stats, meta)
    tm.eval()
    with torch.no_grad():
        tin = torch.tensor(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
        traced = torch.jit.trace(tm, tin)
        path = str(tmp_path / "m.ts")
        traced.save(path)
        got = torch.jit.load(path)(tin).numpy()
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)
