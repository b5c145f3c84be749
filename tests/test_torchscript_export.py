"""TorchScript deployment interchange: the torch.nn rebuild of the YOLOX
graph (deploy/torch_infer.py) traced + torch.jit.save'd must reproduce the
jax eval forward THROUGH the .pt file — the analogue of the reference's PL
to_torchscript export (reference tools/export_torchscript.py:16)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pl_yolo_tpu.deploy import numpy_infer as ni  # noqa: E402
from pl_yolo_tpu.deploy.torch_infer import export_torchscript  # noqa: E402
from pl_yolo_tpu.models.detector import build_model  # noqa: E402

from test_numpy_deploy import TINY  # noqa: E402


def _export_via_pt(cfg, tmp_path, size=64, num_classes=3, batch=2):
    from tools.export_npz import export_npz

    model = build_model(dict(cfg), num_classes=num_classes)
    variables = model.init(jax.random.key(0), input_size=(size, size))
    npz = str(tmp_path / "m.npz")
    export_npz(cfg, jax.device_get(variables), npz, num_classes)
    params, stats, meta = ni.load_npz(npz)

    pt = str(tmp_path / "m.pt")
    export_torchscript(params, stats, meta, pt, size=size, batch=batch)

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32)
    dev = np.asarray(model.loss.eval_decode(
        model.module.apply(variables, jnp.asarray(img), False)), np.float32)

    ts = torch.jit.load(pt)  # through the FILE, fresh graph
    with torch.no_grad():
        got = ts(torch.from_numpy(img.transpose(0, 3, 1, 2).copy())).numpy()
    return dev, got


def test_torchscript_file_reproduces_jax_forward(tmp_path):
    dev, got = _export_via_pt(TINY, tmp_path)
    assert got.shape == dev.shape
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)


def test_torchscript_file_depthwise(tmp_path):
    cfg = json.loads(json.dumps(TINY))
    cfg["backbone"]["depthwise"] = True
    cfg["neck"]["depthwise"] = True
    cfg["head"]["depthwise"] = True
    dev, got = _export_via_pt(cfg, tmp_path)
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)
