"""Runtime-independent deployment: weights-as-npz + pure-numpy inference.

The interchange analogue of the reference's ONNX export/demo pair
(tools/export_onnx.py + tools/onnx_inference.py) for an environment with no
ONNX serializer: tools/export_npz.py writes the artifact, numpy_infer runs
it anywhere numpy exists. StableHLO export (tools/export.py) remains the
XLA-native deployment path.
"""

from .numpy_infer import forward, load_npz, postprocess  # noqa: F401
