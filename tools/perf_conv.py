#!/usr/bin/env python
"""Per-conv MEASURED vs roofline attribution on the real TPU.

tools/ablate_backward.py (r3) isolates pure conv fwd+bwd at ~170 ms
@B128 640^2 while tools/roofline.py bounds it at ~114 ms; this tool finds
WHERE the ~56 ms goes. It traces the same grad jaxpr roofline.py uses,
keeps every `conv_general_dilated` equation WITH its full params (window
strides, padding, lhs/rhs dilation, dimension numbers, dtypes — so the
forward, grad-input, and grad-filter convs each appear as themselves),
dedups identical signatures, executes each one standalone under jit on
the TPU, and prints measured-total vs the per-conv roofline bound,
sorted by measured cost.

Reading the table: `x bound` >> 1 on a signature = that conv runs far
under roofline; lhs-dilated (grad-input for stride-2) and rhs-dilated
(grad-filter) rows are the usual suspects — XLA lowers those to
scatter-ish or multi-pass MXU programs.

Caveat: standalone timing loses cross-op fusion/overlap, so the SUM of
measured times normally exceeds the in-graph conv total; the per-row
measured/bound RATIO is the signal, not the sum.

Usage: python tools/perf_conv.py [--batch 128] [--size 640] [--iters 20]
       [--top 40]
"""

from __future__ import annotations

import argparse
import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _ceil128(x: int) -> int:
    return max(128, 128 * math.ceil(x / 128))


def collect_conv_eqns(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            out.append(eqn)
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                collect_conv_eqns(sub.jaxpr, out)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        collect_conv_eqns(s.jaxpr, out)
    return out


def signature(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    p = eqn.params
    return (
        tuple(lhs.shape), str(lhs.dtype), tuple(rhs.shape), str(rhs.dtype),
        tuple(p["window_strides"]), tuple(map(tuple, p["padding"])),
        tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
        p["dimension_numbers"], p.get("feature_group_count", 1),
        p.get("batch_group_count", 1), str(p.get("precision")),
        str(p.get("preferred_element_type")),
    )


def role_of(sig):
    """Classify fwd / dgrad (lhs-dilated or plain transposed) / wgrad."""
    lhs_dil, rhs_dil = sig[6], sig[7]
    dn = sig[8]
    if any(d > 1 for d in rhs_dil):
        return "wgrad" if sig[10] == 1 else "wgrad"
    if any(d > 1 for d in lhs_dil):
        return "dgrad"
    # grad-filter of a stride-1 conv has no rhs dilation but batch-group
    # or swapped dims; detect via out_spec feature dim == batch-ish size
    if sig[10] > 1:
        return "wgrad"
    # fallback: plain conv
    if dn.out_spec[0] == 0 and dn.lhs_spec[0] == 0:
        return "fwd"
    return "wgrad?"


def bound_seconds(eqn, peak, bw):
    lhs = tuple(eqn.invars[0].aval.shape)
    rhs = tuple(eqn.invars[1].aval.shape)
    res = tuple(eqn.outvars[0].aval.shape)
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    n = res[dn.out_spec[1]]
    m = res[dn.out_spec[0]]
    for d in dn.out_spec[2:]:
        m *= res[d]
    k = rhs[dn.rhs_spec[1]]
    for d in dn.rhs_spec[2:]:
        k *= rhs[d]
    flops = 2.0 * m * k * n
    ng = max(n // fgc, 1)
    eff = (k / _ceil128(k)) * (ng / _ceil128(ng))
    t_mxu = flops / (peak * eff) if eff else 0.0
    t_hbm = 2 * (math.prod(lhs) + math.prod(rhs) + math.prod(res)) / bw
    return max(t_mxu, t_hbm), flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
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
    # trace only — shape structs, nothing touches the device until timing
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
    print(f"traced {len(eqns)} conv eqns", flush=True)

    groups = {}
    for eqn in eqns:
        sig = signature(eqn)
        if sig in groups:
            groups[sig][1] += 1
        else:
            groups[sig] = [eqn, 1]
    print(f"{len(groups)} unique signatures", flush=True)

    peak, bw = args.peak_tflops * 1e12, args.hbm_gbps * 1e9
    key = jax.random.key(0)

    # null baseline: per-iteration dispatch + final fence-RTT overhead of
    # the timing loop itself (the axon tunnel adds ~15 ms of readback
    # latency to the closing fence; subtract it from every row)
    null = jax.jit(lambda a: a)
    z = jnp.zeros((8, 128), jnp.float32)
    _ = float(jnp.sum(null(z)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        z2 = null(z)
    _ = float(jnp.sum(z2))
    overhead = (time.perf_counter() - t0) / args.iters
    print(f"timing-loop overhead: {overhead * 1e3:.3f} ms/iter", flush=True)

    rows = []
    for i, (sig, (eqn, cnt)) in enumerate(groups.items()):
        lhs_av, rhs_av = eqn.invars[0].aval, eqn.invars[1].aval
        p = eqn.params

        def run(a, b, _p=p):
            return jax.lax.conv_general_dilated(
                a, b,
                window_strides=_p["window_strides"],
                padding=_p["padding"],
                lhs_dilation=_p["lhs_dilation"],
                rhs_dilation=_p["rhs_dilation"],
                dimension_numbers=_p["dimension_numbers"],
                feature_group_count=_p.get("feature_group_count", 1),
                batch_group_count=_p.get("batch_group_count", 1),
                precision=_p.get("precision"),
                preferred_element_type=_p.get("preferred_element_type"),
            )

        f = jax.jit(run)
        try:
            a = jax.random.normal(key, lhs_av.shape, jnp.float32).astype(
                lhs_av.dtype)
            b = jax.random.normal(key, rhs_av.shape, jnp.float32).astype(
                rhs_av.dtype)
            o = f(a, b)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = f(a, b)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            t = max((time.perf_counter() - t0) / args.iters - overhead, 1e-9)
            del a, b, o
        except Exception as e:  # OOM on a pathological signature: skip, note
            rows.append((sig, cnt, float("nan"), *bound_seconds(eqn, peak, bw),
                         f"ERR {type(e).__name__}"))
            continue
        att, flops = bound_seconds(eqn, peak, bw)
        rows.append((sig, cnt, t, att, flops, ""))
        print(f"  [{i + 1}/{len(groups)}] {role_of(sig):6s} "
              f"lhs{sig[0]} rhs{sig[2]} x{cnt}: {t * 1e3:7.2f} ms "
              f"(bound {att * 1e3:6.2f})", flush=True)

    print(f"\n{'role':>6} {'count':>5} {'meas ms':>8} {'tot ms':>8} "
          f"{'bound ms':>8} {'x bound':>7} {'TFLOP/s':>8}  shape")
    rows.sort(key=lambda r: -(0 if r[2] != r[2] else r[2] * r[1]))
    tot_meas = tot_bound = 0.0
    role_tot = {}
    for i, (sig, cnt, t, att, flops, err) in enumerate(rows):
        role = role_of(sig)
        if t == t:
            tot_meas += t * cnt        # totals over ALL rows, print top-N
            tot_bound += att * cnt
            role_tot[role] = role_tot.get(role, 0.0) + t * cnt
            if i < args.top:
                print(f"{role:>6} {cnt:>5} {t * 1e3:>8.2f} "
                      f"{t * cnt * 1e3:>8.2f} "
                      f"{att * cnt * 1e3:>8.2f} {t / att:>7.2f} "
                      f"{flops / t / 1e12:>8.1f}  "
                      f"lhs{sig[0]} rhs{sig[2]} ws{sig[4]} ld{sig[6]} "
                      f"rd{sig[7]}")
        elif i < args.top:
            print(f"{role:>6} {cnt:>5} {'—':>8} {'—':>8} "
                  f"{att * cnt * 1e3:>8.2f} {'—':>7} {'—':>8}  {err}")
    print(f"\nstandalone sum (all {len(rows)} signatures): measured "
          f"{tot_meas * 1e3:.1f} ms vs bound "
          f"{tot_bound * 1e3:.1f} ms  (x{tot_meas / max(tot_bound, 1e-9):.2f})")
    for role, t in sorted(role_tot.items(), key=lambda kv: -kv[1]):
        print(f"  {role:6s} {t * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
