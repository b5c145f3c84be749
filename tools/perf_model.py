"""Model-path TPU profile: train-step MFU breakdown, stem variants, HLO audit.

Times the YOLOX-s forward / forward+backward / full train step at B/SIZE,
reads XLA's own FLOP count for an MFU estimate, compares the Focus stem
against the mathematically-equivalent 6x6-stride-2 conv, and counts
copy/transpose ops in the compiled HLO (relayout audit).

Run: python tools/perf_model.py [batch [size]]
"""

from __future__ import annotations

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=10, warmup=3):
    import jax.numpy as jnp

    r = None
    for _ in range(warmup):
        r = f(*args)
    leaf = jax.tree.leaves(r)[0]
    _ = float(jnp.sum(leaf if leaf.ndim else leaf[None]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    leaf = jax.tree.leaves(r)[0]
    _ = float(jnp.sum(leaf if leaf.ndim else leaf[None]))
    return (time.perf_counter() - t0) / iters


import jax  # noqa: E402


def main():
    import jax.numpy as jnp
    from flax import linen as nn

    from pl_yolo_tpu.layers.blocks import set_compute_dtype, Focus, ConvBlock
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config
    import pathlib

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    cfg = load_config(pathlib.Path(__file__).parent.parent
                      / "pl_yolo_tpu/configs/model/yolox_s.yaml")
    model = build_model(cfg, num_classes=80)
    variables = model.init(jax.random.key(0), input_size=(size, size))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)),
                         jnp.float32)
    labels = np.zeros((batch, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (batch, 8))
    labels[:, :8, 1:] = rng.uniform(50, size - 100, (batch, 8, 4))
    labels = jnp.asarray(labels)

    # ---- forward only
    fwd = jax.jit(lambda v, x: model.module.apply(v, x, False))
    lowered = fwd.lower(variables, images)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    fwd_flops = float(cost.get("flops", 0)) if cost else 0.0
    t_fwd = timeit(fwd, variables, images)
    print(f"forward:        {t_fwd*1e3:7.2f} ms  "
          f"{fwd_flops/t_fwd/1e12:6.1f} TFLOP/s "
          f"({fwd_flops/1e9:.1f} GFLOP)", flush=True)

    # ---- forward+backward (loss, no optimizer). Pass the batch as ARGS —
    # closing over it bakes a 314MB constant into the HLO (tunnel 413).
    def loss_fn(params, bs, x, y):
        outs, _ = model.module.apply(
            {"params": params, "batch_stats": bs}, x, True,
            mutable=["batch_stats"])
        return model.loss.train_loss(outs, y)["loss"]

    grad = jax.jit(lambda p, b, x, y: jax.grad(loss_fn)(p, b, x, y))
    gc = grad.lower(variables["params"], variables["batch_stats"],
                    images, labels).compile()
    gcost = gc.cost_analysis()
    if isinstance(gcost, (list, tuple)):
        gcost = gcost[0]
    g_flops = float(gcost.get("flops", 0)) if gcost else 0.0
    t_grad = timeit(grad, variables["params"], variables["batch_stats"],
                    images, labels)
    print(f"fwd+bwd+loss:   {t_grad*1e3:7.2f} ms  "
          f"{g_flops/t_grad/1e12:6.1f} TFLOP/s "
          f"({g_flops/1e9:.1f} GFLOP)", flush=True)

    # ---- full train step (no aug) for reference
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
    state = TrainState.create(variables, tx)
    step = make_train_step(model.module.apply, model.loss.train_loss)
    t_step = timeit(lambda s: step(s, images, labels, jax.random.key(0))[0],
                    state, iters=6)
    print(f"train step:     {t_step*1e3:7.2f} ms  "
          f"({batch/t_step:.0f} img/s, no aug)", flush=True)

    # ---- HLO relayout audit
    txt = compiled.as_text()
    counts = {k: len(re.findall(rf"\b{k}\(", txt))
              for k in ("copy", "transpose", "convolution", "fusion",
                        "reduce", "custom-call")}
    print("fwd HLO op counts:", counts, flush=True)

    # ---- stem variants: Focus (s2d + 3x3) vs direct 6x6 s2 conv
    set_compute_dtype(jnp.bfloat16)

    class Conv6Stem(nn.Module):
        out_channels: int = 32

        @nn.compact
        def __call__(self, x, train=False):
            return ConvBlock(self.out_channels, ksize=6, stride=2, padding=2,
                             name="conv")(x, train)

    for name, mod in [("focus stem", Focus(32, ksize=3)),
                      ("conv6x6s2 stem", Conv6Stem(32))]:
        v = mod.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))

        def f(vv, x):
            out, _ = mod.apply(vv, x, True, mutable=["batch_stats"])
            return out
        fj = jax.jit(f)
        dt = timeit(fj, v, images)
        # and its backward
        gj = jax.jit(lambda vv, x: jax.grad(
            lambda p: jnp.sum(mod.apply(
                {"params": p, "batch_stats": vv["batch_stats"]}, x, True,
                mutable=["batch_stats"])[0].astype(jnp.float32)))(
            vv["params"]))
        dtg = timeit(gj, v, images)
        print(f"{name:16s}: fwd {dt*1e3:6.2f} ms, bwd {dtg*1e3:6.2f} ms",
              flush=True)
    set_compute_dtype(None)


if __name__ == "__main__":
    main()
