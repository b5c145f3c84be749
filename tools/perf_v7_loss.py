#!/usr/bin/env python
"""Attribute the YOLOv7 train-step slowness on TPU (r5 finding: the v7
gate ran 27 s/epoch vs yolox's 1.3 s on the same data — ~20x).

Times, fenced with scalar readbacks:
  * yolox_tiny vs yolov7_tiny FULL train step at the gate shapes
  * the v7 loss forward alone
  * isolated suspect ops at the loss's actual shapes: the vmapped
    advanced-indexing gather (flat_preds[flat_idx]), the scatter-max
    tobj build (t.at[idx].max(v)), and their one-hot matmul rewrites.

Usage: python tools/perf_v7_loss.py [--batch 32] [--size 160]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench(fn, *args, iters=20, warm=3):
    import jax
    import jax.numpy as jnp
    f = jax.jit(fn)
    for _ in range(warm):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=160)
    args = ap.parse_args()
    B, S = args.batch, args.size

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    repo = pathlib.Path(__file__).resolve().parent.parent
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    labels = np.zeros((B, 100, 5), np.float32)
    labels[:, :12, 0] = rng.integers(0, 6, (B, 12))
    labels[:, :12, 1:] = rng.uniform(10, S - 10, (B, 12, 4)) * np.asarray(
        [1, 1, 0.3, 0.3])
    labels = jnp.asarray(labels)
    out = {"batch": B, "size": S}

    for name in ("yolox_tiny", "yolov7_tiny"):
        cfg = dict(load_config(repo / f"pl_yolo_tpu/configs/model/{name}.yaml"))
        model = build_model(cfg, num_classes=6)
        variables = model.init(jax.random.key(0), input_size=(S, S))
        tx, _ = build_optimizer(cfg["optimizer"], total_steps=100)
        state = TrainState.create(variables, tx)
        step = make_train_step(model.module.apply, model.loss.train_loss,
                               donate=False)
        for i in range(3):
            _, losses = step(state, images, labels, jax.random.key(i))
        _ = float(losses["loss"])
        t0 = time.perf_counter()
        for i in range(10):
            _, losses = step(state, images, labels, jax.random.key(i))
        _ = float(losses["loss"])
        out[f"{name}_step_ms"] = round((time.perf_counter() - t0) / 10 * 1e3,
                                       1)

        # loss forward only
        outs = model.module.apply(variables, images, False)
        out[f"{name}_loss_fwd_ms"] = round(bench(
            lambda o, l: model.loss.train_loss(o, l)["loss"], outs, labels),
            1)

    # ---- isolated suspects at the v7 loss's real shapes
    na, L, M = 3, 3, 100
    A = sum(3 * (S // s) ** 2 for s in (8, 16, 32))
    Ca = M * L * na * 3
    ch = 11
    flat = jnp.asarray(rng.normal(0, 1, (B, A, ch)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, A, (B, Ca)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 1, (B, Ca)), jnp.float32)
    out["shapes"] = {"A": A, "Ca": Ca}

    out["gather_vmap_ms"] = round(bench(
        jax.vmap(lambda a, i: a[i]), flat, idx), 2)
    out["gather_onehot_ms"] = round(bench(
        lambda a, i: jnp.matmul(jax.nn.one_hot(i, A, dtype=a.dtype), a),
        flat, idx), 2)
    out["scatter_max_ms"] = round(bench(
        jax.vmap(lambda i, v: jnp.zeros((A,), jnp.float32).at[i].max(v)),
        idx, vals), 2)
    out["scatter_max_onehot_ms"] = round(bench(
        lambda i, v: jnp.max(
            jax.nn.one_hot(i, A, dtype=jnp.float32) * v[..., None], axis=1),
        idx, vals), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
