#!/usr/bin/env python
"""Trained-checkpoint deployment chain (VERDICT r4 'Weak #5').

Every deploy artifact used to be produced from random-init weights; this
tool runs the path a USER actually runs — a trained Orbax checkpoint
(best-mAP step, EMA weights, real BN statistics) through every exporter —
and verifies each artifact against the jax eval forward of the restored
model:

    ckpt --> npz --> pure-numpy runtime      (deploy/numpy_infer.py)
                 --> ONNX --> numpy executor (deploy/onnx_export.py + runtime)
                 --> TorchScript (.pt)       (deploy/torch_infer.py, if torch)

Mirrors reference tools/export_onnx.py:14-15 (loads a trained state_dict,
not random init). Prints one JSON line with the max-abs parity per
artifact; exit 1 if any exceeds --tol.

Usage:
    python tools/deploy_from_ckpt.py -c pl_yolo_tpu/configs/model/yolox_tiny.yaml \
        --checkpoint /tmp/accuracy_gate_run/gate_yolox_tiny/checkpoints \
        --num-classes 6 --size 160 --out-dir /tmp/deploy_r5
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def restore_eval_variables(model, ckpt_dir: str, size: int, step=None,
                           optimizer_cfg: dict | None = None):
    """Restore the BEST-mAP step's EMA weights + BN stats from an Orbax
    checkpoint written by the Trainer (full _ckpt_tree layout).

    optimizer_cfg must match the training run's `optimizer:` section —
    Orbax restores by tree structure, and the opt_state skeleton depends
    on the optax chain (momentum/weight-decay/accumulation all change it).
    """
    import jax

    from pl_yolo_tpu.train.checkpoint import CheckpointManager
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState

    variables = model.init(jax.random.key(0), input_size=(size, size))
    tx, _ = build_optimizer(optimizer_cfg or {"name": "SGD",
                                              "learning_rate": 0.01,
                                              "momentum": 0.9},
                            total_steps=1)
    state = TrainState.create(variables, tx)
    abstract = {
        "step": state.step, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
    }
    mgr = CheckpointManager(ckpt_dir)
    if step is None:
        step = mgr.best_step if mgr.best_step is not None else None
    restored = mgr.restore(step=step, abstract_tree=abstract)
    mgr.close()
    return jax.device_get({"params": restored["ema_params"],
                           "batch_stats": restored["ema_batch_stats"]}), \
        int(restored["step"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--out-dir", default="/tmp/deploy_from_ckpt")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max-abs parity tolerance (trained weights give "
                         "larger activations than random init)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the jax side on CPU (leave the TPU alone)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pl_yolo_tpu.deploy import numpy_infer as ni
    from pl_yolo_tpu.deploy.onnx_export import export_onnx
    from pl_yolo_tpu.deploy.onnx_numpy_runtime import OnnxModel
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config
    from tools.export_npz import export_npz

    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = dict(load_config(args.config))
    # the exported artifacts are fp32; the parity oracle must be the fp32
    # jax forward, not the bf16 training compute dtype (reported separately)
    train_dtype = cfg.pop("dtype", None)
    model = build_model(cfg, num_classes=args.num_classes)
    variables, step = restore_eval_variables(
        model, args.checkpoint, args.size,
        optimizer_cfg=cfg.get("optimizer"))
    print(f"restored best-mAP checkpoint at step {step} "
          f"(EMA weights + BN stats)")

    # the oracle: jax eval forward of the RESTORED model
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (1, args.size, args.size, 3)).astype(
        np.float32)
    dev = np.asarray(model.loss.eval_decode(
        model.module.apply(variables, jnp.asarray(img), False)), np.float32)
    scale = float(np.abs(dev).max())

    results = {"ckpt_step": step, "oracle_scale": round(scale, 2)}

    if train_dtype:  # informational: fp32 artifact vs bf16 device forward
        bf16_model = build_model({**cfg, "dtype": train_dtype},
                                 num_classes=args.num_classes)
        bdev = np.asarray(bf16_model.loss.eval_decode(
            bf16_model.module.apply(variables, jnp.asarray(img), False)),
            np.float32)
        results[f"device_{train_dtype}_vs_fp32_diff"] = float(
            np.abs(bdev - dev).max())

    # ---- npz + pure-numpy runtime
    npz = str(out / "model.npz")
    export_npz(cfg, variables, npz, args.num_classes)
    params, stats, meta = ni.load_npz(npz)
    host = ni.forward(params, stats, img, meta)  # NHWC, 0-255
    results["npz_numpy_max_abs"] = float(np.abs(host - dev).max())

    # ---- ONNX file + numpy executor
    onnx_bytes = export_onnx(params, stats, meta, batch=1, size=args.size)
    (out / "model.onnx").write_bytes(onnx_bytes)
    om = OnnxModel(onnx_bytes)
    got = om.run({"images": np.ascontiguousarray(
        img.transpose(0, 3, 1, 2))})["predictions"]
    results["onnx_numpy_max_abs"] = float(np.abs(got - dev).max())

    # ---- TorchScript (optional dependency)
    try:
        import torch

        from pl_yolo_tpu.deploy.torch_infer import export_torchscript
        pt = str(out / "model.pt")
        export_torchscript(params, stats, meta, pt, size=args.size, batch=1)
        ts = torch.jit.load(pt)
        with torch.no_grad():
            tout = ts(torch.from_numpy(np.ascontiguousarray(
                img.transpose(0, 3, 1, 2)))).numpy()
        results["torchscript_max_abs"] = float(np.abs(tout - dev).max())
    except ImportError:
        results["torchscript_max_abs"] = None

    parities = [v for k, v in results.items()
                if k.endswith("_max_abs") and v is not None]
    results["tol"] = args.tol
    results["pass"] = bool(all(p <= args.tol for p in parities))
    print(json.dumps(results))
    sys.exit(0 if results["pass"] else 1)


if __name__ == "__main__":
    main()
