"""Pure-numpy executor for the exported ONNX graphs (no onnx package).

The in-environment verifier AND portable fallback runtime for artifacts
produced by deploy/onnx_export.py: parses the ModelProto wire format back
(onnx_writer.parse_message) and executes the op subset those graphs use —
Conv / MaxPool / Resize / Concat / Slice / Reshape / Transpose / Sigmoid /
Exp / Add / Sub / Mul / Identity — with standard ONNX semantics (NCHW,
OIHW weights, pads [t,l,b,r]). tests/test_onnx_export.py asserts this
executor reproduces the jax eval forward through the .onnx FILE, which
pins both the serializer and the graph builder; an external onnxruntime
sees exactly the same bytes. Mirrors what the reference's onnxruntime
demo consumes (reference tools/onnx_inference.py:22-71).
"""

from __future__ import annotations

import numpy as np

from . import onnx_writer as ow
from .numpy_infer import conv2d, max_pool_same, sigmoid


def _attr_value(msg: dict):
    atype = msg.get(20, [0])[0]
    if atype == 1:
        return np.frombuffer(msg[2][0], "<f4")[0].item()
    if atype == 2:
        v = msg[3][0]
        return v - (1 << 64) if v >= (1 << 63) else v
    if atype == 3:
        return msg[4][0].decode()
    if atype == 4:
        return ow.parse_tensor(msg[5][0])[1]
    if atype == 6:
        return np.frombuffer(msg[7][0], "<f4").tolist()
    if atype == 7:
        vals = ow.parse_packed_varints(msg[8][0])
        return [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
    raise ValueError(f"unsupported attribute type {atype}")


class OnnxModel:
    """Parsed model: .nodes [(op, inputs, outputs, attrs)], .initializers,
    .input_names / .output_names, run(feeds) -> dict of outputs."""

    def __init__(self, model_bytes: bytes):
        mp = ow.parse_message(model_bytes)
        gp = ow.parse_message(mp[7][0])
        self.name = gp.get(2, [b""])[0].decode()
        self.initializers = {}
        for t in gp.get(5, []):
            name, arr = ow.parse_tensor(t)
            self.initializers[name] = arr
        self.nodes = []
        for nb in gp.get(1, []):
            nm = ow.parse_message(nb)
            op = nm[4][0].decode()
            inputs = [v.decode() for v in nm.get(1, [])]
            outputs = [v.decode() for v in nm.get(2, [])]
            attrs = {}
            for ab in nm.get(5, []):
                am = ow.parse_message(ab)
                attrs[am[1][0].decode()] = _attr_value(am)
            self.nodes.append((op, inputs, outputs, attrs))
        self.input_names = [self._vi_name(v) for v in gp.get(11, [])]
        self.output_names = [self._vi_name(v) for v in gp.get(12, [])]

    @staticmethod
    def _vi_name(vi_bytes: bytes) -> str:
        return ow.parse_message(vi_bytes)[1][0].decode()

    # ------------------------------------------------------------ execution

    def run(self, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        vals: dict[str, np.ndarray] = dict(self.initializers)
        for k, v in feeds.items():
            vals[k] = np.asarray(v, np.float32)
        for op, inputs, outputs, attrs in self.nodes:
            args = [vals[i] for i in inputs]
            vals[outputs[0]] = _OPS[op](args, attrs)
        return {n: vals[n] for n in self.output_names}


def _op_conv(args, attrs):
    x, w = args[0], args[1]
    bias = args[2] if len(args) > 2 else None
    pads = attrs.get("pads", [0, 0, 0, 0])
    assert pads[0] == pads[1] == pads[2] == pads[3], "symmetric pads only"
    strides = attrs.get("strides", [1, 1])
    groups = int(attrs.get("group", 1))
    # NCHW/OIHW -> NHWC/HWIO, reuse the numpy_infer conv
    y = conv2d(np.ascontiguousarray(x.transpose(0, 2, 3, 1)),
               np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
               bias=bias, stride=int(strides[0]), pad=int(pads[0]),
               groups=groups)
    return np.ascontiguousarray(y.transpose(0, 3, 1, 2))


def _op_maxpool(args, attrs):
    k = int(attrs["kernel_shape"][0])
    assert attrs.get("strides", [1, 1])[0] == 1 and \
        int(attrs.get("pads", [0] * 4)[0]) == k // 2, "SAME s1 pools only"
    x = args[0].transpose(0, 2, 3, 1)
    return np.ascontiguousarray(max_pool_same(x, k).transpose(0, 3, 1, 2))


def _op_resize(args, attrs):
    x, scales = args[0], args[-1]
    assert attrs.get("mode") == "nearest" and list(scales) == [1, 1, 2, 2]
    assert attrs.get("coordinate_transformation_mode") == "asymmetric"
    return x.repeat(2, axis=2).repeat(2, axis=3)


def _op_slice(args, attrs):
    x, starts, ends, axes = args[0], args[1], args[2], args[3]
    idx = [slice(None)] * x.ndim
    for st, en, ax in zip(starts, ends, axes):
        idx[int(ax)] = slice(int(st), int(en))
    return x[tuple(idx)]


_OPS = {
    "Conv": _op_conv,
    "MaxPool": _op_maxpool,
    "Resize": _op_resize,
    "Slice": _op_slice,
    "Reshape": lambda a, at: a[0].reshape([int(d) for d in a[1]]),
    "Transpose": lambda a, at: a[0].transpose(at["perm"]),
    "Concat": lambda a, at: np.concatenate(a, axis=int(at["axis"])),
    "Sigmoid": lambda a, at: sigmoid(a[0]),
    "Exp": lambda a, at: np.exp(a[0]),
    "Add": lambda a, at: a[0] + a[1],
    "Sub": lambda a, at: a[0] - a[1],
    "Mul": lambda a, at: a[0] * a[1],
    "Identity": lambda a, at: a[0],
}
