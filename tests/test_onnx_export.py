"""ONNX deployment interchange: the clean-room serializer
(deploy/onnx_writer.py) + YOLOX graph builder (deploy/onnx_export.py) +
pure-numpy executor (deploy/onnx_numpy_runtime.py) must reproduce the jax
eval forward THROUGH the .onnx file — the environment's full analogue of
the reference's torch->ONNX->onnxruntime chain (reference
tools/export_onnx.py:20, tools/onnx_inference.py:22-71)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from pl_yolo_tpu.deploy import numpy_infer as ni
from pl_yolo_tpu.deploy import onnx_writer as ow
from pl_yolo_tpu.deploy.onnx_export import export_onnx
from pl_yolo_tpu.deploy.onnx_numpy_runtime import OnnxModel
from pl_yolo_tpu.models.detector import build_model

from test_numpy_deploy import TINY


def test_wire_roundtrip_primitives():
    """Serializer <-> parser: varints (incl. 64-bit negatives), packed
    repeats, tensors with raw_data."""
    for v in (0, 1, 127, 128, 300, 2**31, 2**63 - 1, -1, -5):
        blob = ow.f_varint(3, v)
        msg = ow.parse_message(blob)
        got = msg[3][0]
        if got >= 1 << 63:
            got -= 1 << 64
        assert got == v, v
    rng = np.random.default_rng(0)
    for arr in (rng.normal(size=(3, 4)).astype(np.float32),
                np.arange(6, dtype=np.int64).reshape(2, 3),
                np.array(2.5, np.float32)):
        name, back = ow.parse_tensor(ow.tensor("t", arr))
        assert name == "t"
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype


def _export_via_onnx(cfg, tmp_path, size=64, num_classes=3, batch=2):
    from tools.export_npz import export_npz

    model = build_model(dict(cfg), num_classes=num_classes)
    variables = model.init(jax.random.key(0), input_size=(size, size))
    npz = str(tmp_path / "m.npz")
    export_npz(cfg, jax.device_get(variables), npz, num_classes)
    params, stats, meta = ni.load_npz(npz)

    onnx_bytes = export_onnx(params, stats, meta, batch=batch, size=size)
    path = tmp_path / "m.onnx"
    path.write_bytes(onnx_bytes)

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32)
    dev = np.asarray(model.loss.eval_decode(
        model.module.apply(variables, jnp.asarray(img), False)), np.float32)

    m = OnnxModel(path.read_bytes())
    assert m.input_names == ["images"]
    assert m.output_names == ["predictions"]
    got = m.run({"images": img.transpose(0, 3, 1, 2)})["predictions"]
    return dev, got, m


def test_onnx_file_reproduces_jax_forward(tmp_path):
    dev, got, m = _export_via_onnx(TINY, tmp_path)
    assert got.shape == dev.shape
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)
    # the graph is a real op graph, not a constant blob
    ops = {n[0] for n in m.nodes}
    assert {"Conv", "Sigmoid", "Mul", "Concat", "MaxPool", "Resize",
            "Slice", "Exp"} <= ops


def test_onnx_file_depthwise(tmp_path):
    cfg = json.loads(json.dumps(TINY))
    cfg["backbone"]["depthwise"] = True
    cfg["neck"]["depthwise"] = True
    cfg["head"]["depthwise"] = True
    dev, got, m = _export_via_onnx(cfg, tmp_path)
    np.testing.assert_allclose(got, dev, rtol=1e-3, atol=1e-4)
    assert any(n[3].get("group", 1) > 1 for n in m.nodes if n[0] == "Conv")


def test_onnx_structural_contract(tmp_path):
    """IR/opset headers + static shapes: what an external runtime checks
    before executing anything."""
    from tools.export_npz import export_npz

    model = build_model(dict(TINY), num_classes=3)
    variables = model.init(jax.random.key(0), input_size=(64, 64))
    npz = str(tmp_path / "m.npz")
    export_npz(TINY, jax.device_get(variables), npz, 3)
    params, stats, meta = ni.load_npz(npz)
    blob = export_onnx(params, stats, meta, batch=1, size=64)

    mp = ow.parse_message(blob)
    assert mp[1][0] == 8                       # ir_version
    opset = ow.parse_message(mp[8][0])
    assert opset[2][0] == 13                   # opset version
    gp = ow.parse_message(mp[7][0])
    vi = ow.parse_message(gp[11][0])           # input ValueInfo
    tt = ow.parse_message(ow.parse_message(vi[2][0])[1][0])
    assert tt[1][0] == ow.FLOAT
    dims = [ow.parse_message(d)[1][0]
            for d in ow.parse_message(tt[2][0])[1]]
    assert dims == [1, 3, 64, 64]
    # every node input resolves to an initializer, graph input, or an
    # earlier node output (topological well-formedness)
    m = OnnxModel(blob)
    known = set(m.initializers) | {"images"}
    for op, inputs, outputs, _ in m.nodes:
        for i in inputs:
            assert i in known, f"{op} consumes undefined {i}"
        known.update(outputs)
    assert "predictions" in known
