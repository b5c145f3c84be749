"""Model export: StableHLO / saved jit artifacts + host inference demo.

Capability parity with the reference export tools
(tools/export_onnx.py:20, export_torchscript.py:16): the TPU-native
deployment artifact is StableHLO (XLA's portable IR — the ONNX/TorchScript
equivalent for the JAX ecosystem), exported via jax.export with the full
eval pipeline (forward + decode + NMS) baked in at a fixed input shape.

Usage:
  python tools/export.py -c <model.yaml> --ckpt <ckpt dir> -o model.stablehlo \
      [--size 640] [--num-classes 80] [--batch 1] [--conf 0.25] [--nms 0.5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def export_stablehlo(model, variables, out_path: str, batch: int = 1,
                     size: int = 640, conf: float = 0.25, nms: float = 0.5,
                     platforms=("tpu", "cpu")):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from pl_yolo_tpu.ops.nms import postprocess

    def serve(variables, images):
        preds = model.loss.eval_decode(model.module.apply(variables, images, False))
        det = postprocess(preds, conf_threshold=conf, iou_threshold=nms)
        return det.boxes, det.scores, det.classes, det.valid

    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    exported = jexport.export(jax.jit(serve),
                              platforms=list(platforms))(variables, x)
    data = exported.serialize()
    Path(out_path).write_bytes(data)
    return len(data)


def main():
    p = argparse.ArgumentParser("export")
    p.add_argument("-c", "--model_config", required=True)
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("-o", "--output", default="model.stablehlo")
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.5)
    args = p.parse_args()

    import jax
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    model = build_model(load_config(args.model_config), args.num_classes)
    variables = model.init(jax.random.key(0), input_size=(args.size, args.size))
    if args.ckpt:
        from pl_yolo_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.ckpt)
        restored = mgr.restore()
        params = restored.get("ema_params") or restored["params"]
        stats = restored.get("ema_batch_stats") or restored.get("batch_stats", {})
        variables = {"params": params, "batch_stats": stats}
    n = export_stablehlo(model, variables, args.output, batch=args.batch,
                         size=args.size, conf=args.conf, nms=args.nms)
    print(f"wrote {args.output} ({n / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
