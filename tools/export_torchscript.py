#!/usr/bin/env python
"""Export a YOLOX- or YOLOv7-family model to TorchScript (reference
tools/export_torchscript.py:16 uses PL `to_torchscript`; here the graph is
rebuilt in torch.nn from the npz weight record — deploy/torch_infer.py —
traced, and torch.jit.save'd so any libtorch runtime loads it). --verify
reloads the written .pt with torch.jit.load and asserts parity against
the jax eval forward.

Usage:
    python tools/export_torchscript.py -c <model.yaml>
        [--checkpoint runs/.../checkpoints] --out yolox_s.pt
        [--batch 1] [--size 640] [--verify]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="model.pt")
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tool (fp32-tight)

    from export_npz import export_npz
    from pl_yolo_tpu.deploy import numpy_infer as ni
    from pl_yolo_tpu.deploy.torch_infer import export_torchscript
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

    with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
        export_npz(cfg, jax.device_get(variables), tmp.name,
                   args.num_classes)
        params, stats, meta = ni.load_npz(tmp.name)
    export_torchscript(params, stats, meta, args.out, size=args.size,
                       batch=args.batch)
    print(f"wrote {args.out} "
          f"({pathlib.Path(args.out).stat().st_size / 2**20:.2f} MiB, "
          f"input [{args.batch},3,{args.size},{args.size}])")

    if args.verify:
        import jax.numpy as jnp
        import torch

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (args.batch, args.size, args.size, 3)
                          ).astype(np.float32)
        dev = np.asarray(model.loss.eval_decode(model.module.apply(
            variables, jnp.asarray(img), False)), np.float32)
        ts = torch.jit.load(args.out)
        with torch.no_grad():
            got = ts(torch.from_numpy(
                img.transpose(0, 3, 1, 2).copy())).numpy()
        tol = 1e-4
        err = float(np.max(np.abs(dev - got) / np.maximum(1.0, np.abs(dev))))
        print(f"max rel err jax-vs-torchscript-file: {err:.3e} (tol {tol})")
        assert err <= tol, "TorchScript artifact parity FAILED"


if __name__ == "__main__":
    main()
