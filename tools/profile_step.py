"""Decompose the train step's wall time: augment / forward / +loss / +bwd.

Usage:
  python tools/profile_step.py [-c pl_yolo_tpu/configs/model/yolox_s.yaml]
      [--batch 64] [--size 640] [--iters 10]

Each stage is jitted separately and timed with a scalar-readback fence
(utils/profiler.py conventions — block_until_ready can ack early through
the axon tunnel). Differences between stages give the per-component cost:
e.g. loss fwd = (fwd+loss) - forward, backward = (fwd+loss+bwd) - (fwd+loss).
This is the tool that located the 24 ms SimOTA top-k and the 11 ms mixup
partner sampling (see ops/topk.py, ops/pallas/mosaic_pallas.py docstrings).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    B, S, N = args.batch, args.size, args.iters
    cfg = load_config(pathlib.Path(args.config))
    model = build_model(cfg, num_classes=cfg.get("num_classes", 80))
    variables = model.init(jax.random.key(0), input_size=(S, S))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
    state = TrainState.create(variables, tx)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    labels = np.zeros((B, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (B, 8))
    labels[:, :8, 1:] = rng.uniform(S * 0.1, S * 0.85, (B, 8, 4))
    labels = jnp.asarray(labels)
    aug_cfg = AugmentConfig(max_labels=100)

    def timeit(f, *a):
        out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))  # fence
        t0 = time.perf_counter()
        for _i in range(N):
            out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / N * 1e3

    aug = jax.jit(lambda r, i, l: device_augment(r, i, l, aug_cfg))
    t_aug = timeit(aug, jax.random.key(1), images, labels)
    print(f"augment        {t_aug:8.2f} ms")
    ai, al = aug(jax.random.key(1), images, labels)

    fwd = jax.jit(lambda v, x: model.module.apply(
        v, x, True, mutable=["batch_stats"])[0])
    t_fwd = timeit(fwd, variables, ai)
    print(f"forward        {t_fwd:8.2f} ms")

    def fl(v, x, l):
        outs, _ = model.module.apply(v, x, True, mutable=["batch_stats"])
        return model.loss.train_loss(outs, l)

    t_fl = timeit(jax.jit(fl), variables, ai, al)
    print(f"fwd+loss       {t_fl:8.2f} ms   (loss fwd ~{t_fl - t_fwd:.2f})")

    def loss_of_params(p, v, x, l):
        vv = dict(v)
        vv["params"] = p
        return fl(vv, x, l)["loss"]

    vg = jax.jit(lambda v, x, l: jax.value_and_grad(loss_of_params)(
        v["params"], v, x, l))
    t_vgb = timeit(vg, variables, ai, al)
    print(f"fwd+loss+bwd   {t_vgb:8.2f} ms   (backward ~{t_vgb - t_fl:.2f})")

    step = make_train_step(model.module.apply, model.loss.train_loss,
                           augment_fn=lambda r, i, l: device_augment(
                               r, i, l, aug_cfg))
    s2, losses = step(state, images, labels, jax.random.key(0))
    _ = float(losses["loss"])
    t0 = time.perf_counter()
    for i in range(N):
        s2, losses = step(s2, images, labels, jax.random.key(i))
    _ = float(losses["loss"])
    t_full = (time.perf_counter() - t0) / N * 1e3
    print(f"full step      {t_full:8.2f} ms   "
          f"({B / t_full * 1e3:.1f} img/s)")


if __name__ == "__main__":
    main()
