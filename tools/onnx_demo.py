#!/usr/bin/env python
"""ONNX inference demo: load a .onnx exported by tools/export_onnx.py, run
an image, numpy NMS, print/save detections — the analogue of the
reference's onnxruntime demo (reference tools/onnx_inference.py:22-103,
which does session.run + numpy multiclass NMS). Here the session is the
in-tree pure-numpy ONNX executor; swap in onnxruntime by replacing
`OnnxModel(...).run` with `InferenceSession(...).run` — the artifact is a
standard opset-13 graph.

Usage: python tools/onnx_demo.py model.onnx image.jpg [--conf 0.3]
       [--nms 0.65] [--out detections.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pl_yolo_tpu.deploy.numpy_infer import postprocess  # noqa: E402
from pl_yolo_tpu.deploy.onnx_numpy_runtime import OnnxModel  # noqa: E402


def letterbox(img: np.ndarray, size: int):
    """Aspect-preserving resize + 114-pad (reference data_augments.py:90-106
    semantics) in numpy/PIL. Returns (input NCHW float32, scale ratio)."""
    from PIL import Image

    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    resized = np.asarray(Image.fromarray(img).resize((nw, nh)), np.uint8)
    canvas = np.full((size, size, 3), 114, np.uint8)
    canvas[:nh, :nw] = resized
    return canvas[None].astype(np.float32).transpose(0, 3, 1, 2), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("image")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--nms", type=float, default=0.65)
    ap.add_argument("--out", default=None, help="write detections JSON")
    args = ap.parse_args()

    from PIL import Image

    m = OnnxModel(pathlib.Path(args.model).read_bytes())
    # input size from the model's declared input shape
    import pl_yolo_tpu.deploy.onnx_writer as ow
    mp = ow.parse_message(pathlib.Path(args.model).read_bytes())
    gp = ow.parse_message(mp[7][0])
    vi = ow.parse_message(gp[11][0])
    tt = ow.parse_message(ow.parse_message(vi[2][0])[1][0])
    dims = [ow.parse_message(d)[1][0] for d in ow.parse_message(tt[2][0])[1]]
    size = int(dims[-1])

    img = np.asarray(Image.open(args.image).convert("RGB"))
    inp, ratio = letterbox(img, size)
    preds = m.run({"images": inp})["predictions"]
    dets = postprocess(preds, conf_threshold=args.conf,
                       iou_threshold=args.nms)[0]
    dets[:, :4] /= ratio  # unscale to the original image
    print(f"{dets.shape[0]} detections (conf>={args.conf}):")
    for x1, y1, x2, y2, score, cls in dets:
        print(f"  class {int(cls):3d} score {score:.3f} "
              f"box [{x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f}]")
    if args.out:
        json.dump([{"bbox": [float(v) for v in d[:4]],
                    "score": float(d[4]), "category": int(d[5])}
                   for d in dets], open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
