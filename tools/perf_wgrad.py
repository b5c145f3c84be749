#!/usr/bin/env python
"""A/B the grad-filter (wgrad) lowering: XLA's conv vs a k*k-dot decomposition.

VERDICT r3 next-step #1: the per-conv attribution (tools/perf_conv.py) shows
typical 3x3 wgrad rows running at ~50% of their roofline bound — XLA lowers
conv_backprop_filter as an rhs-dilated conv whose MXU packing is poor. The
round-3 Conv1x1 win (layers/blocks.py) proved lowering-level substitution
works when it stays INSIDE XLA (plain dots, no opaque custom calls). This
tool measures the same trick for k x k convs:

    wgrad[di,dj,ci,co] = sum_{b,ho,wo} xpad[b, s*ho+di, s*wo+dj, ci]
                                       * dy[b,ho,wo,co]

i.e. per kernel tap (di,dj): one strided slice of the padded activation and
one tall-skinny dot_general contracting (B,Ho,Wo) — k*k dots total, each
with a huge contraction dim (MXU-friendly) and the same fp32 accumulation.
Exact same sum as the conv, reassociation aside.

For every unique forward conv in the YOLOX-s train graph this measures
  t_xla  : jit(grad of vdot(conv(x,w), dy) wrt w)   — the wgrad XLA emits
  t_dots : jit(wgrad_dots(x, dy))                   — the decomposition
verifies allclose (fp32 reference), and prints a per-row verdict table.

Usage: python tools/perf_wgrad.py [--batch 128] [--size 640] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def collect_fwd_convs(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            p = eqn.params
            if (all(d == 1 for d in p["lhs_dilation"])
                    and all(d == 1 for d in p["rhs_dilation"])
                    and p.get("batch_group_count", 1) == 1
                    and p.get("feature_group_count", 1) == 1):
                out.append(eqn)
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                collect_fwd_convs(sub.jaxpr, out)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        collect_fwd_convs(s.jaxpr, out)
    return out


def wgrad_dots(x, dy, kh, kw, stride, padding, out_dtype):
    """Grad-filter of an NHWC conv as kh*kw strided-slice + dot_general.

    x: [B,H,W,Cin] activations, dy: [B,Ho,Wo,Cout] output cotangent.
    Returns [kh,kw,Cin,Cout] in out_dtype (fp32 accumulation on the MXU).
    """
    import jax.numpy as jnp
    from jax import lax

    B, H, W, Ci = x.shape
    _, Ho, Wo, Co = dy.shape
    (pt, pb), (pl, pr) = padding
    xp = lax.pad(x, jnp.zeros((), x.dtype),
                 ((0, 0, 0), (pt, pb, 0), (pl, pr, 0), (0, 0, 0)))
    taps = []
    for di in range(kh):
        row = []
        for dj in range(kw):
            xs = lax.slice(
                xp, (0, di, dj, 0),
                (B, di + stride * (Ho - 1) + 1, dj + stride * (Wo - 1) + 1,
                 Ci),
                (1, stride, stride, 1))
            w = lax.dot_general(
                xs, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32)
            row.append(w.astype(out_dtype))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--min-k", type=int, default=2,
                    help="skip 1x1 (already dot-lowered by Conv1x1)")
    args = ap.parse_args()

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    xs = jax.ShapeDtypeStruct((B, S, S, 3), jnp.float32)
    ys = jax.ShapeDtypeStruct((B, 50, 5), jnp.float32)
    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(var_shapes, xs, ys)
    eqns = collect_fwd_convs(jaxpr.jaxpr, [])

    # dedup forward conv signatures (shape, dtype, stride, padding)
    groups = {}
    for eqn in eqns:
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        p = eqn.params
        kh, kw = rhs.shape[0], rhs.shape[1]
        if max(kh, kw) < args.min_k:
            continue
        sig = (tuple(lhs.shape), str(lhs.dtype), tuple(rhs.shape),
               str(rhs.dtype), tuple(p["window_strides"]),
               tuple(map(tuple, p["padding"])))
        groups[sig] = groups.get(sig, 0) + 1
    print(f"{len(groups)} unique fwd conv signatures (k>={args.min_k})",
          flush=True)

    # timing-loop overhead (axon fence RTT)
    null = jax.jit(lambda a: a)
    z = jnp.zeros((8, 128), jnp.float32)
    _ = float(jnp.sum(null(z)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        z2 = null(z)
    _ = float(jnp.sum(z2))
    overhead = (time.perf_counter() - t0) / args.iters
    print(f"timing overhead {overhead * 1e3:.2f} ms/iter", flush=True)

    key = jax.random.key(0)
    rows = []
    for i, (sig, cnt) in enumerate(groups.items()):
        (lshape, ldt, rshape, rdt, strides, padding) = sig
        Bx, H, W, Ci = lshape
        kh, kw, _, Co = rshape
        s = strides[0]
        (pt, pb), (pl, pr) = padding
        Ho = (H + pt + pb - kh) // s + 1
        Wo = (W + pl + pr - kw) // s + 1
        dt = jnp.dtype(ldt)

        def conv(x, w, _s=strides, _p=padding):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=_s, padding=_p,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def wgrad_xla(x, dy, _sh=rshape, _dt=jnp.dtype(rdt)):
            return jax.grad(
                lambda w: jnp.vdot(conv(x, w).astype(jnp.float32),
                                   dy.astype(jnp.float32)))(
                jnp.zeros(_sh, _dt))

        def wgrad_dot(x, dy, _kh=kh, _kw=kw, _s=s, _p=padding,
                      _dt=jnp.dtype(rdt)):
            return wgrad_dots(x, dy.astype(x.dtype), _kh, _kw, _s, _p, _dt)

        f_xla = jax.jit(wgrad_xla)
        f_dot = jax.jit(wgrad_dot)
        try:
            x = (jax.random.normal(key, lshape, jnp.float32) * 0.5).astype(dt)
            dy = (jax.random.normal(key, (Bx, Ho, Wo, Co), jnp.float32)
                  * 0.5).astype(dt)
            a = f_xla(x, dy)
            b = f_dot(x, dy)
            ref = np.asarray(a, np.float32)
            got = np.asarray(b, np.float32)
            scale = max(np.abs(ref).max(), 1e-6)
            err = np.abs(ref - got).max() / scale
            ok = err < (2e-2 if dt == jnp.bfloat16 else 1e-4)

            def bench(f):
                o = f(x, dy)
                _ = float(jnp.sum(o.astype(jnp.float32)))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = f(x, dy)
                _ = float(jnp.sum(o.astype(jnp.float32)))
                return max((time.perf_counter() - t0) / args.iters - overhead,
                           1e-9)

            t_xla = bench(f_xla)
            t_dot = bench(f_dot)
            del x, dy, a, b
        except Exception as e:
            print(f"  [{i + 1}] lhs{lshape} rhs{rshape} ERR "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        flops = 2.0 * Bx * Ho * Wo * kh * kw * Ci * Co
        rows.append((sig, cnt, t_xla, t_dot, flops, err, ok))
        print(f"  [{i + 1}/{len(groups)}] lhs{lshape} rhs{rshape} s{s} x{cnt}"
              f": xla {t_xla * 1e3:7.2f} dots {t_dot * 1e3:7.2f} ms "
              f"({t_xla / t_dot:4.2f}x) "
              f"{flops / t_xla / 1e12:6.1f} -> {flops / t_dot / 1e12:6.1f} "
              f"TF/s err {err:.1e} {'OK' if ok else 'MISMATCH'}", flush=True)

    rows.sort(key=lambda r: -(r[2] * r[1]))
    tot_xla = sum(r[2] * r[1] for r in rows)
    tot_dot = sum(r[3] * r[1] for r in rows)
    tot_best = sum(min(r[2], r[3]) * r[1] for r in rows)
    print(f"\nwgrad population: xla {tot_xla * 1e3:.1f} ms, "
          f"all-dots {tot_dot * 1e3:.1f} ms, per-row-best "
          f"{tot_best * 1e3:.1f} ms")
    print("rows where dots wins (candidate substitutions):")
    for (sig, cnt, t_xla, t_dot, flops, err, ok) in rows:
        if ok and t_dot < t_xla * 0.95:
            print(f"  lhs{sig[0]} rhs{sig[2]} ws{sig[4]} x{cnt}: "
                  f"{t_xla * 1e3:.2f} -> {t_dot * 1e3:.2f} ms "
                  f"(saves {(t_xla - t_dot) * cnt * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
