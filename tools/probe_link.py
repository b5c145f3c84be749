#!/usr/bin/env python
"""Measure the host->device link with compressible (zeros) vs
incompressible (random) payloads.

r4's bench measured h2d_link_MBps=55.8 with an all-zeros probe while the
e2e path (real image bytes) shipped at ~34.6 MB/s (tools/e2e_diag.py) —
hypothesis: the axon tunnel transport compresses, so a zeros probe
overstates the bandwidth available to real batches.

Usage: python tools/probe_link.py [--batch 128] [--size 640]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, S = args.batch, args.size
    fence = jax.jit(lambda a: jnp.sum(a[0, 0, 0].astype(jnp.float32)))
    out = {"batch": B, "size": S}

    payloads = {
        "zeros": np.zeros((B, S, S, 3), np.uint8),
        "random": np.random.default_rng(0).integers(
            0, 256, (B, S, S, 3), dtype=np.uint8),
    }
    # real JPEG-decoded pixels if the bench cache exists
    try:
        import pathlib
        import sys
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        from bench import _ensure_bench_jpegs  # noqa: PLC0415
        from pl_yolo_tpu.data.datasets import COCODataset
        root = _ensure_bench_jpegs(min(B, 512), S)
        ds = COCODataset(root, "annotations/instances.json", "images",
                         img_size=(S, S), max_labels=50)
        imgs = np.stack([ds[i % len(ds)]["image"] for i in range(B)])
        payloads["real"] = np.ascontiguousarray(imgs, np.uint8)
    except Exception as e:  # pragma: no cover - diagnostic convenience
        out["real_err"] = repr(e)

    _ = float(fence(jnp.asarray(payloads["zeros"])))  # warm compile
    for name, arr in payloads.items():
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            dev = jnp.asarray(arr)
            _ = float(fence(dev))
            ts.append(time.perf_counter() - t0)
            del dev
        mb = arr.nbytes / 2**20
        out[f"{name}_MBps"] = [round(mb / t, 1) for t in ts]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
