#!/usr/bin/env python
"""A/B: 1x1 convs lowered as conv_general_dilated vs dot_general on TPU.

Motivation (PERF.md, tools/perf_conv.py r3): the 1x1 grad-filter rows of
the YOLOX-s step run at 10-25 TFLOP/s — far under the 117-135 TFLOP/s the
3x3 forward rows reach. A 1x1 stride-1 conv IS a matmul
([B*H*W, Cin] @ [Cin, Cout]); expressing it as `lax.dot_general` changes
only the lowering (math identical), and its VJP becomes two plain matmuls
(dgrad: dy @ W^T, wgrad: x^T @ dy) instead of XLA's transposed-conv
programs. Unlike a Pallas custom call, a dot_general stays fully visible
to XLA fusion/overlap — the r2 fused-SimOTA lesson does not apply.

This tool traces the YOLOX-s train grad like tools/perf_conv.py, keeps the
FORWARD 1x1 stride-1 signatures, and times fwd-only and fwd+vjp for both
formulations standalone on the device. If dot wins in aggregate, flip
ConvBlock's 1x1 path and A/B the full bench.

Usage: python tools/perf_1x1.py [--batch 128] [--size 640] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from perf_conv import collect_conv_eqns, signature  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    cfg = load_config(pathlib.Path(args.config))
    model = build_model(cfg, num_classes=80)
    B, S = args.batch, args.size
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), input_size=(S, S)))

    def loss_fn(v, x, y):
        outs = model.module.apply(v, x, True,
                                  rngs={"dropout": jax.random.key(0)},
                                  mutable=["batch_stats"])[0]
        return model.loss.train_loss(outs, y)["loss"]

    x = jax.ShapeDtypeStruct((B, S, S, 3), jnp.float32)
    y = jax.ShapeDtypeStruct((B, 50, 5), jnp.float32)
    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(var_shapes, x, y)
    eqns = collect_conv_eqns(jaxpr.jaxpr, [])

    # forward 1x1 stride-1 signatures: rhs spatial dims (HWIO positions 0,1)
    # both 1, no dilation, groups 1, NHWC lhs (4D), out feature = rhs O.
    groups = {}
    for eqn in eqns:
        sig = signature(eqn)
        rhs_shape = sig[2]
        p = eqn.params
        dn = p["dimension_numbers"]
        spatial = [rhs_shape[d] for d in dn.rhs_spec[2:]]
        if (spatial == [1, 1]
                and tuple(p["window_strides"]) == (1, 1)
                and tuple(p["lhs_dilation"]) == (1, 1)
                and tuple(p["rhs_dilation"]) == (1, 1)
                and p.get("feature_group_count", 1) == 1
                and p.get("batch_group_count", 1) == 1
                # forward convs only: canonical NHWC/HWIO/NHWC numbers
                # (grad convs appear with permuted specs — skip them; their
                # lowering follows the forward op we'd replace)
                and tuple(dn.lhs_spec) == (0, 3, 1, 2)
                and tuple(dn.rhs_spec) == (3, 2, 0, 1)
                and tuple(dn.out_spec) == (0, 3, 1, 2)):
            if sig in groups:
                groups[sig][1] += 1
            else:
                groups[sig] = [eqn, 1]
    print(f"{len(groups)} unique forward 1x1 signatures", flush=True)

    key = jax.random.key(0)
    null = jax.jit(lambda a: a)
    z = jnp.zeros((8, 128), jnp.float32)
    _ = float(jnp.sum(null(z)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        z2 = null(z)
    _ = float(jnp.sum(z2))
    overhead = (time.perf_counter() - t0) / args.iters
    print(f"timing-loop overhead: {overhead * 1e3:.3f} ms/iter", flush=True)

    def time_fn(f, *arrs):
        o = f(*arrs)
        _ = float(jnp.sum(o[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f(*arrs)
        _ = float(jnp.sum(o[0].astype(jnp.float32)))
        return max((time.perf_counter() - t0) / args.iters - overhead, 1e-9)

    tot = {"conv_f": 0.0, "dot_f": 0.0, "conv_g": 0.0, "dot_g": 0.0}
    print(f"{'count':>5} {'lhs':>24} {'rhs':>18} "
          f"{'conv f':>8} {'dot f':>8} {'conv f+b':>9} {'dot f+b':>9}")
    for sig, (eqn, cnt) in sorted(
            groups.items(), key=lambda kv: -kv[1][1]):
        lhs_av, rhs_av = eqn.invars[0].aval, eqn.invars[1].aval
        dt = lhs_av.dtype
        a = jax.random.normal(key, lhs_av.shape, jnp.float32).astype(dt)
        w4 = jax.random.normal(key, rhs_av.shape, jnp.float32).astype(
            rhs_av.dtype)
        w2 = w4.reshape(w4.shape[-2], w4.shape[-1])

        def conv_f(a, w):
            return (jax.lax.conv_general_dilated(
                a, w, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")),)

        def dot_f(a, w):
            return (jax.lax.dot_general(a, w, (((3,), (0,)), ((), ()))),)

        def grad_of(f):
            def g(a, w):
                def s(a, w):
                    return jnp.sum(f(a, w)[0].astype(jnp.float32))
                return jax.grad(s, argnums=(0, 1))(a, w)
            return g

        tf_c = time_fn(jax.jit(conv_f), a, w4)
        tf_d = time_fn(jax.jit(dot_f), a, w2)
        tg_c = time_fn(jax.jit(grad_of(conv_f)), a, w4)
        tg_d = time_fn(jax.jit(grad_of(dot_f)), a, w2)
        tot["conv_f"] += tf_c * cnt
        tot["dot_f"] += tf_d * cnt
        tot["conv_g"] += tg_c * cnt
        tot["dot_g"] += tg_d * cnt
        print(f"{cnt:>5} {str(tuple(lhs_av.shape)):>24} "
              f"{str(tuple(rhs_av.shape)):>18} "
              f"{tf_c * 1e3:>8.3f} {tf_d * 1e3:>8.3f} "
              f"{tg_c * 1e3:>9.3f} {tg_d * 1e3:>9.3f}", flush=True)
        del a, w4, w2

    print(f"\naggregate (weighted by occurrence):"
          f"\n  fwd       conv {tot['conv_f'] * 1e3:7.2f} ms   "
          f"dot {tot['dot_f'] * 1e3:7.2f} ms"
          f"\n  fwd+vjp   conv {tot['conv_g'] * 1e3:7.2f} ms   "
          f"dot {tot['dot_g'] * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
