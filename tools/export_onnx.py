#!/usr/bin/env python
"""Export a YOLOX- or YOLOv7-family model to ONNX (reference tools/export_onnx.py:20).

No onnx/torch-exporter is importable in this environment, so the artifact
is produced by the in-tree clean-room serializer
(pl_yolo_tpu/deploy/onnx_writer.py + onnx_export.py): a standard
opset-13, IR-v8 NCHW graph with BN folded into convs and decode through
xyxy+sigmoid scores — `predictions` [B, A, 5+C], NMS left to the consumer
like the reference ONNX artifact. --verify executes the written FILE with
the pure-numpy ONNX runtime and asserts parity against the jax forward.

Usage:
    python tools/export_onnx.py -c pl_yolo_tpu/configs/model/yolox_s.yaml \
        [--checkpoint runs/.../checkpoints] --out yolox_s.onnx \
        [--batch 1] [--size 640] [--verify]

Consume with any ONNX runtime, or in-repo:
    python tools/onnx_demo.py yolox_s.onnx image.jpg
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (Orbax); EMA weights are exported")
    ap.add_argument("--out", default="model.onnx")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--verify", action="store_true",
                    help="execute the written file (numpy ONNX runtime) "
                         "and assert parity vs the jax eval forward")
    args = ap.parse_args()

    import jax

    # export is a host-side tool: pin to CPU so the --verify parity band is
    # fp32-tight (on the TPU backend jax's default matmul precision is
    # bf16-based, which would loosen the jax side of the comparison, and
    # the tunnel makes compiles slow for no benefit here)
    jax.config.update("jax_platforms", "cpu")

    from export_npz import export_npz  # tools/ sibling
    from pl_yolo_tpu.deploy import numpy_infer as ni
    from pl_yolo_tpu.deploy.onnx_export import export_onnx
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    cfg = dict(load_config(args.config))
    # the exported artifact is fp32 weights/math, so the verify
    # reference is the fp32 jax forward: a bf16 train-config forward
    # differs by compute-dtype noise the anchor decode amplifies
    # ((2*sig)^2*anchor), which is a property of the training dtype,
    # not of the artifact (cf. tools/deploy_from_ckpt.py)
    cfg["dtype"] = "float32"
    model = build_model(cfg, num_classes=args.num_classes)
    variables = model.init(jax.random.key(0),
                           input_size=(args.size, args.size))
    if args.checkpoint:
        from pl_yolo_tpu.train.checkpoint import CheckpointManager
        restored = CheckpointManager(args.checkpoint).restore(
            abstract_tree={"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {}),
                           "ema_params": variables["params"],
                           "ema_batch_stats": variables.get(
                               "batch_stats", {})})
        variables = {"params": restored["ema_params"],
                     "batch_stats": restored["ema_batch_stats"]}

    # npz is the weight interchange; ONNX is built from the same record
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
        export_npz(cfg, jax.device_get(variables), tmp.name,
                   args.num_classes)
        params, stats, meta = ni.load_npz(tmp.name)
    blob = export_onnx(params, stats, meta, batch=args.batch,
                       size=args.size)
    pathlib.Path(args.out).write_bytes(blob)
    print(f"wrote {args.out}: {len(blob) / 2**20:.2f} MiB, opset 13, "
          f"input [{args.batch},3,{args.size},{args.size}]")

    if args.verify:
        import jax.numpy as jnp

        from pl_yolo_tpu.deploy.onnx_numpy_runtime import OnnxModel

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (args.batch, args.size, args.size, 3)
                          ).astype(np.float32)
        dev = np.asarray(model.loss.eval_decode(model.module.apply(
            variables, jnp.asarray(img), False)), np.float32)
        got = OnnxModel(pathlib.Path(args.out).read_bytes()).run(
            {"images": img.transpose(0, 3, 1, 2)})["predictions"]
        tol = 1e-4
        err = float(np.max(np.abs(dev - got) / np.maximum(1.0, np.abs(dev))))
        print(f"max rel err jax-vs-onnx-file: {err:.3e} (tol {tol})")
        assert err <= tol, "ONNX artifact parity FAILED"
        dets = ni.postprocess(got, conf_threshold=0.3)
        print(f"onnx postprocess: {[d.shape[0] for d in dets]} detections")


if __name__ == "__main__":
    main()
