#!/usr/bin/env python
"""Export a YOLOX- or YOLOv7-family model to a runtime-independent .npz artifact.

The runtime-independent deployment path (reference tools/export_onnx.py:20
exports ONNX — ours is tools/export_onnx.py via the clean-room serializer;
this sibling artifact is a flat npz of fp32 weights + a JSON meta record,
loadable with numpy alone) consumed by
pl_yolo_tpu/deploy/numpy_infer.py — a single-file pure-numpy runtime that
reproduces the device eval outputs (verified by tests/test_numpy_deploy.py
and by this script's --verify flag, the analogue of
tools/onnx_inference.py:22-71's parity demo).

Usage:
    python tools/export_npz.py -c configs/model/yolox_s.yaml \
        --checkpoint runs/yolox_s/checkpoints --out yolox_s.npz --verify

Without --checkpoint the export uses fresh-init weights (still a valid
parity check; detections are meaningless).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def flatten(tree, prefix):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(flatten(v, key))
        else:
            flat[key] = np.asarray(v, np.float32)
    return flat


def export_npz(model_cfg: dict, variables: dict, out_path: str,
               num_classes: int) -> dict:
    """Write the npz artifact; returns the meta record."""
    names = (model_cfg["backbone"]["name"], model_cfg["neck"]["name"],
             model_cfg["head"]["name"])
    if names == ("cspdarknet", "csppafpn", "decoupled_head"):
        family = "yolox"
    elif names == ("eelan", "yolov7neck", "implicit_head"):
        family = "yolov7"
    elif names == ("cspdarknet", "csppafpn", "simple_head"):
        family = "yolov5"
    else:
        raise SystemExit(
            "npz deploy covers the YOLOX family (cspdarknet + csppafpn + "
            "decoupled_head), the YOLOv7 family (eelan + yolov7neck + "
            "implicit_head), and the YOLOv5 family (cspdarknet + csppafpn "
            f"+ simple_head); got {names}")
    meta = {
        "family": family,
        "num_classes": num_classes,
        "backbone_depths": list(model_cfg["backbone"].get(
            "depths", [3, 9, 9, 3])),
        "backbone_outputs": list(model_cfg["backbone"].get(
            "outputs", ["stage2", "stage3", "stage4"])),
        "neck_depths": list(model_cfg["neck"].get("depths", [1, 1, 1, 1])),
        "backbone_depthwise": bool(model_cfg["backbone"].get(
            "depthwise", False)),
        "neck_depthwise": bool(model_cfg["neck"].get("depthwise", False)),
        "head_depthwise": bool(model_cfg["head"].get("depthwise", False)),
        "strides": list(model_cfg.get("loss", {}).get(
            "stride", [8, 16, 32])),
        "layout": "NHWC, kernels HWIO, pixels 0-255 float32",
    }
    if family in ("yolov7", "yolov5"):
        from pl_yolo_tpu.models.detector import DEFAULT_V7_ANCHORS
        from pl_yolo_tpu.models.losses.yolov5 import DEFAULT_V5_ANCHORS
        default = (DEFAULT_V7_ANCHORS if family == "yolov7"
                   else DEFAULT_V5_ANCHORS)
        meta["anchors"] = [[list(a) for a in lvl] for lvl in
                           model_cfg["loss"].get("anchors", default)]
        meta["num_anchor"] = int(model_cfg["head"].get("num_anchor", 3))
    arrays = flatten(variables["params"], "params")
    arrays.update(flatten(variables.get("batch_stats", {}), "batch_stats"))
    arrays["__meta__"] = np.asarray(json.dumps(meta))
    np.savez(out_path, **arrays)
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (Orbax); EMA weights are exported")
    ap.add_argument("--out", default="model.npz")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--verify", action="store_true",
                    help="run jax vs numpy parity on a random image")
    ap.add_argument("--size", type=int, default=256,
                    help="verify image size (multiple of 64)")
    args = ap.parse_args()

    import jax

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
    meta = export_npz(cfg, jax.device_get(variables), args.out,
                      args.num_classes)
    n = sum(x.size for x in jax.tree.leaves(variables))
    print(f"wrote {args.out}: {n / 1e6:.2f}M params, meta={meta}")

    if args.verify:
        import jax.numpy as jnp

        from pl_yolo_tpu.deploy import numpy_infer as ni

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (1, args.size, args.size, 3)).astype(
            np.float32)
        dev = np.asarray(model.loss.eval_decode(model.module.apply(
            variables, jnp.asarray(img), False)), np.float32)
        params, stats, meta = ni.load_npz(args.out)
        host = ni.forward(params, stats, img, meta)
        # bf16 model compute -> loose band; fp32 models sit at ~1e-5
        tol = 1e-4
        err = float(np.max(np.abs(dev - host)
                           / np.maximum(1.0, np.abs(dev))))
        print(f"max rel err jax-vs-numpy: {err:.3e} (tol {tol})")
        assert err <= tol, "numpy deploy parity FAILED"
        dets = ni.postprocess(host, conf_threshold=0.3)
        print(f"numpy postprocess: {[d.shape[0] for d in dets]} detections")
        print("parity OK")


if __name__ == "__main__":
    main()
