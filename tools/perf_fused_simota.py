#!/usr/bin/env python
"""In-step A/B of the fused Pallas SimOTA assignment (VERDICT r4 next-4b).

r2 measured the fused kernel (ops/pallas/simota_pallas.py) at 15.7 ms
standalone but 505 -> 299 img/s IN the step — the opaque custom call
defeated XLA's overlap. PERF.md:71 left "revisit with double-buffered grid
pipelining" open. This tool re-runs the full-step A/B under the CURRENT
tuned flags (scoped-vmem + latency-hiding scheduler landed AFTER the r2
experiment) with interleaved trials so tunnel drift can't bias one arm.

Usage: python tools/perf_fused_simota.py [--batch 128] [--size 640]
       [--iters 10] [--trials 3]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    B, S = args.batch, args.size

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.layers.blocks import stem_input_s2d
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    repo = pathlib.Path(__file__).resolve().parent.parent

    def make_step(pallas_assign):
        cfg = dict(load_config(
            repo / "pl_yolo_tpu/configs/model/yolox_s.yaml"))
        cfg["loss"] = dict(cfg["loss"], pallas_assign=pallas_assign)
        model = build_model(cfg, num_classes=80)
        variables = model.init(jax.random.key(0), input_size=(S, S))
        tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
        state = TrainState.create(variables, tx)
        aug_cfg = AugmentConfig(max_labels=100)
        raw_apply = model.module.apply

        def s2d_apply(v, images, train, **kw):
            with stem_input_s2d():
                return raw_apply(v, images, train, **kw)

        step = make_train_step(
            s2d_apply, model.loss.train_loss,
            augment_fn=lambda r, i, l: device_augment(r, i, l, aug_cfg,
                                                      out_s2d=True))
        return step, state

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    labels = np.zeros((B, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (B, 8))
    labels[:, :8, 1:] = rng.uniform(50, 550, (B, 8, 4))
    labels = jnp.asarray(labels)

    arms = {}
    for name, flag in (("jnp", False), ("pallas", True)):
        step, state = make_step(flag)
        t0 = time.time()
        for i in range(3):
            state, losses = step(state, images, labels, jax.random.key(i))
        loss0 = float(losses["loss"])
        print(f"[{name}] compiled+warm in {time.time()-t0:.0f}s "
              f"loss={loss0:.4f}", flush=True)
        arms[name] = (step, state, loss0)

    # loss parity between arms on identical inputs (assignment exactness)
    dl = abs(arms["jnp"][2] - arms["pallas"][2])
    print(f"warm-loss |jnp - pallas| = {dl:.5f}", flush=True)

    results = {k: [] for k in arms}
    for trial in range(args.trials):
        for name in ("jnp", "pallas", "pallas", "jnp")[trial % 2::2]:
            step, state, _ = arms[name]
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, losses = step(state, images, labels,
                                     jax.random.key(100 * trial + i))
            _ = float(losses["loss"])
            ips = B * args.iters / (time.perf_counter() - t0)
            arms[name] = (step, state, _)
            results[name].append(round(ips, 1))
            print(f"trial {trial} {name}: {ips:.1f} img/s", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({
        "batch": B, "size": S, "iters": args.iters,
        "img_per_s": results, "median": med,
        "pallas_vs_jnp": round(med["pallas"] / med["jnp"], 3),
        "warm_loss_delta": dl,
    }))


if __name__ == "__main__":
    main()
