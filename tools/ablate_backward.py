"""Attribute the train-step backward time: conv vs BN vs SimOTA loss.

The r3 roofline (tools/roofline.py) puts the conv fwd+bwd ceiling at
~114 ms @B128 640^2 while the measured fwd+loss+bwd runs ~227 ms — the
backward is at ~50% of its share. This tool times four jitted variants to
locate the gap:

  base        full fwd + SimOTA loss + backward       (production graph)
  l2          fwd + L2-on-head-outputs + backward      (removes loss bwd)
  nonorm      norm=none fwd + SimOTA loss + backward   (removes BN)
  nonorm_l2   norm=none fwd + L2 + backward            (pure conv path)

  BN cost       = base - nonorm
  loss bwd cost = base - l2
  conv-only     = nonorm_l2  (compare against the roofline ceiling)

Each variant is a distinct graph => own (cached) compile; first run through
the axon tunnel pays minutes per variant.

Usage: python tools/ablate_backward.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import copy
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    B, S, N = args.batch, args.size, args.iters
    base_cfg = load_config(pathlib.Path(args.config))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    labels = np.zeros((B, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (B, 8))
    labels[:, :8, 1:] = rng.uniform(S * 0.1, S * 0.85, (B, 8, 4))
    labels = jnp.asarray(labels)

    def timeit(f, *a):
        out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))  # fence (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(N):
            out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / N * 1e3

    def build(norm):
        cfg = copy.deepcopy(base_cfg)
        if norm is not None:
            for part in ("backbone", "neck", "head"):
                if part in cfg:
                    cfg[part]["norm"] = norm
        model = build_model(cfg, num_classes=cfg.get("num_classes", 80))
        variables = model.init(jax.random.key(0), input_size=(S, S))
        return model, variables

    def l2_loss(outs):
        # head outputs may be any pytree of arrays
        return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                   for o in jax.tree.leaves(outs)) * 1e-9

    results = {}
    for name, norm, use_l2 in (
        ("base", None, False),
        ("l2", None, True),
        ("nonorm", "none", False),
        ("nonorm_l2", "none", True),
    ):
        model, variables = build(norm)

        def loss_fn(p, v, x, l, _model=model, _l2=use_l2):
            vv = dict(v)
            vv["params"] = p
            outs, _ = _model.module.apply(vv, x, True,
                                          mutable=["batch_stats"])
            if _l2:
                return l2_loss(outs)
            return _model.loss.train_loss(outs, l)["loss"]

        vg = jax.jit(lambda v, x, l, _f=loss_fn: jax.value_and_grad(_f)(
            v["params"], v, x, l))
        t = timeit(vg, variables, images, labels)
        results[name] = t
        print(f"{name:10s} fwd+loss+bwd {t:8.2f} ms "
              f"({B / t * 1e3:.1f} img/s)", flush=True)

    if len(results) == 4:
        print(f"\nBN cost (base - nonorm):      "
              f"{results['base'] - results['nonorm']:8.2f} ms")
        print(f"loss bwd+fwd (base - l2):     "
              f"{results['base'] - results['l2']:8.2f} ms")
        print(f"pure conv fwd+bwd (nonorm_l2):{results['nonorm_l2']:8.2f} ms"
              f"   vs roofline ceiling ~114 ms")


if __name__ == "__main__":
    main()
