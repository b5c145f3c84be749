#!/usr/bin/env python
"""Decompose the end-to-end input-pipeline rate (VERDICT r4 'Weak #1').

BENCH_r04 reported e2e 27.84 img/s vs its own measured link bound of
~45 img/s (0.585) where r3 measured 39.99 (0.813) — with no attribution.
This tool times every stage of the exact bench e2e path per-iteration so
the gap is attributable instead of folklore:

  stage a: device step only (resident data)      -> t_step
  stage b: host loader only (disk cache -> batch)-> t_load
  stage c: h2d transfer only, fenced, per batch  -> t_h2d (+variance!)
  stage d: serial pipeline (load+put+fence+step)  -> upper bound on time
  stage e: device_prefetch threaded=True (bench) -> the production path
  stage f: device_prefetch threaded=False

Through the axon tunnel the h2d link wobbles run-to-run; per-iter arrays
in the JSON make that visible. On a real PCIe host stage c is ~100x
faster and stage a becomes binding (PERF.md 'feed budget').

Usage: python tools/e2e_diag.py [--iters 8] [--batch 128] [--size 640]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--depths", type=int, nargs="*", default=None,
                    help="run ONLY the threaded-prefetch stage at these "
                         "queue depths (A/B for how many in-flight h2d "
                         "puts the tunnel pipelines); skips stages a-d/f")
    args = ap.parse_args()
    B, S = args.batch, args.size

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _ensure_bench_jpegs
    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.data.datasets import COCODataset
    from pl_yolo_tpu.data.loader import TrainLoader, device_prefetch
    from pl_yolo_tpu.layers.blocks import stem_input_s2d
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    repo = pathlib.Path(__file__).resolve().parent.parent
    cfg = load_config(repo / "pl_yolo_tpu/configs/model/yolox_s.yaml")
    model = build_model(cfg, num_classes=80)
    variables = model.init(jax.random.key(0), input_size=(S, S))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
    state = TrainState.create(variables, tx)
    aug_cfg = AugmentConfig(max_labels=50)
    raw_apply = model.module.apply

    def s2d_apply(v, images, train, **kw):
        with stem_input_s2d():
            return raw_apply(v, images, train, **kw)

    step = make_train_step(
        s2d_apply, model.loss.train_loss,
        augment_fn=lambda r, i, l: device_augment(r, i, l, aug_cfg,
                                                  out_s2d=True))

    root = _ensure_bench_jpegs(args.images, S)
    ds = COCODataset(root, "annotations/instances.json", "images",
                     img_size=(S, S), max_labels=50)
    ds.attach_disk_cache(os.path.join(root, "diskcache"))

    def put(b):
        return jnp.asarray(b["images"]), jnp.asarray(b["labels"])

    fence = jax.jit(lambda a: jnp.sum(a[0, 0, 0].astype(jnp.float32)))
    out = {"batch": B, "size": S, "iters": args.iters}

    # warm + compile on the uint8 signature
    loader = TrainLoader(ds, B, num_workers=0)
    b0 = next(loader)
    imgs, labs = put(b0)
    state, losses = step(state, imgs, labs, jax.random.key(0))
    _ = float(losses["loss"])

    def timed_pipeline(threaded, depth=2):
        nonlocal state
        ld = TrainLoader(ds, B, num_workers=0)
        batches = device_prefetch(ld, put, depth=depth, threaded=threaded)
        im, la = next(batches)
        state, losses = step(state, im, la, jax.random.key(90))
        _ = float(losses["loss"])
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            im, la = next(batches)
            state, losses = step(state, im, la, jax.random.key(100 + i))
            _ = float(losses["loss"])
            ts.append(time.perf_counter() - t0)
        ld.close()
        return ts

    if args.depths:
        loader.close()
        for d in args.depths:
            ts = timed_pipeline(True, depth=d)
            out[f"e_threaded_depth{d}_s"] = [round(t, 3) for t in ts]
            out[f"e_threaded_depth{d}_ips"] = round(
                B * args.iters / sum(ts), 2)
        print(json.dumps(out))
        return

    # a) device step only (resident arrays)
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, losses = step(state, imgs, labs, jax.random.key(1 + i))
        _ = float(losses["loss"])
        ts.append(time.perf_counter() - t0)
    out["a_step_s"] = [round(t, 3) for t in ts]

    # b) loader only
    ts = []
    for _ in range(3):
        next(loader)
    for i in range(args.iters):
        t0 = time.perf_counter()
        b = next(loader)
        ts.append(time.perf_counter() - t0)
    out["b_load_s"] = [round(t, 3) for t in ts]

    # c) h2d only, fenced per batch
    ts = []
    for i in range(args.iters):
        b = next(loader)
        t0 = time.perf_counter()
        im, la = put(b)
        _ = float(fence(im))
        ts.append(time.perf_counter() - t0)
    nbytes = B * S * S * 3
    out["c_h2d_s"] = [round(t, 3) for t in ts]
    out["c_h2d_MBps"] = [round(nbytes / 2**20 / t, 1) for t in ts]

    # d) serial pipeline
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        b = next(loader)
        im, la = put(b)
        state, losses = step(state, im, la, jax.random.key(50 + i))
        _ = float(losses["loss"])
        ts.append(time.perf_counter() - t0)
    out["d_serial_s"] = [round(t, 3) for t in ts]
    out["d_serial_ips"] = round(B * args.iters / sum(ts), 2)
    loader.close()

    # e) production path: device_prefetch threaded=True
    ts = timed_pipeline(True)
    out["e_prefetch_threaded_s"] = [round(t, 3) for t in ts]
    out["e_prefetch_threaded_ips"] = round(B * args.iters / sum(ts), 2)
    ts = timed_pipeline(False)
    out["f_prefetch_inline_s"] = [round(t, 3) for t in ts]
    out["f_prefetch_inline_ips"] = round(B * args.iters / sum(ts), 2)

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out["summary"] = {
        "t_step_med": round(med(out["a_step_s"]), 3),
        "t_load_med": round(med(out["b_load_s"]), 3),
        "t_h2d_med": round(med(out["c_h2d_s"]), 3),
        "h2d_MBps_med": round(med(out["c_h2d_MBps"]), 1),
        "serial_expected_s": round(med(out["a_step_s"])
                                   + med(out["b_load_s"])
                                   + med(out["c_h2d_s"]), 3),
        "link_bound_ips": round(
            B / med(out["c_h2d_s"]), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
