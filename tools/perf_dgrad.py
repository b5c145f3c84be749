#!/usr/bin/env python
"""A/B the grad-input (dgrad) lowering for stride-2 convs: XLA's lhs-dilated
conv vs a phase-decomposed dense conv.

Completes the per-role lowering audit (1x1 wgrad -> Conv1x1 dot win, r3;
k x k wgrad dots -> negative, tools/perf_wgrad.py): the remaining conv
family never A/B'd is the grad-INPUT of the stride-2 downsample convs.
XLA lowers dx = conv^T(dy, w) as a conv over dy zero-stuffed to the input
grid (lhs_dilation=2) — if the TPU codegen computes that densely, 3/4 of
the MACs multiply structural zeros, capping the row at ~25% efficiency.

The phase decomposition removes the zeros exactly: for stride 2, every
input-grad position (parity r_h, r_w per axis) receives contributions
from a fixed subset of kernel taps, so dx can be computed as ONE dense
stride-1 conv over dy with a [ceil(k/2), ceil(k/2), Cout, 4*Cin] kernel
(taps rearranged from w, zeros where a phase has no tap) followed by a
depth-to-space interleave of the 4 phase grids. Same sum, reassociation
aside; FLOPs ceil(k/2)^2*4/k^2 of dense-dilated's k^2*4 (for k=3: 16/9
useful-work ratio vs the dilated path's 36/9).

For every unique stride-2 forward conv in the YOLOX-s train graph:
  t_xla   : jit(grad of vdot(conv(x,w), dy) wrt x)  — XLA's dgrad
  t_phase : jit(dgrad_phase(dy, w))                 — the decomposition
verified allclose vs the fp32 XLA result.

Usage: python tools/perf_dgrad.py [--batch 128] [--size 640] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def collect_s2_convs(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            p = eqn.params
            if (all(d == 1 for d in p["lhs_dilation"])
                    and all(d == 1 for d in p["rhs_dilation"])
                    and p.get("batch_group_count", 1) == 1
                    and p.get("feature_group_count", 1) == 1
                    and tuple(p["window_strides"]) == (2, 2)):
                out.append(eqn)
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                collect_s2_convs(sub.jaxpr, out)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        collect_s2_convs(s.jaxpr, out)
    return out


def phase_kernel(w, k):
    """Rearrange w [k,k,Ci,Co] into the phase-conv kernel [K2,K2,Co,4*Ci].

    Output channel layout: phase-major — index (r_h*2 + r_w)*Ci + ci, the
    order depth_to_space below interleaves back. K2 = ceil(k/2) with dy
    padded (0, K2-1) per axis; tap m contributes dy[a+m], and kernel tap u
    lands at m = (r + pad - u) / 2 when that is a whole number in range.
    """
    import jax.numpy as jnp

    k2 = (k + 1) // 2
    pad = (k - 1) // 2
    ci, co = w.shape[2], w.shape[3]
    wt = jnp.transpose(w, (0, 1, 3, 2))  # [k,k,Co,Ci]
    out = jnp.zeros((k2, k2, co, 4 * ci), w.dtype)
    for rh in range(2):
        for rw in range(2):
            for uh in range(k):
                num_h = rh + pad - uh
                if num_h % 2 or not (0 <= num_h // 2 < k2):
                    continue
                for uw in range(k):
                    num_w = rw + pad - uw
                    if num_w % 2 or not (0 <= num_w // 2 < k2):
                        continue
                    mh, mw = num_h // 2, num_w // 2
                    ph = (rh * 2 + rw) * ci
                    out = out.at[mh, mw, :, ph:ph + ci].set(wt[uh, uw])
    return out


def dgrad_phase(dy, w, k):
    """dx of a k x k stride-2 SAME conv as one dense conv + interleave.

    dy: [B,Ho,Wo,Co], w: [k,k,Ci,Co]. Returns [B,2Ho,2Wo,Ci] (even input
    sizes — all YOLOX feature maps)."""
    import jax
    import jax.numpy as jnp

    k2 = (k + 1) // 2
    w2 = phase_kernel(w, k)
    out = jax.lax.conv_general_dilated(
        dy, w2, window_strides=(1, 1),
        padding=((0, k2 - 1), (0, k2 - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, ho, wo, _ = out.shape
    ci = w.shape[2]
    out = out.reshape(b, ho, wo, 2, 2, ci)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5))
    return out.reshape(b, 2 * ho, 2 * wo, ci)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
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
    eqns = collect_s2_convs(jaxpr.jaxpr, [])

    groups = {}
    for eqn in eqns:
        lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
        p = eqn.params
        sig = (tuple(lhs.shape), str(lhs.dtype), tuple(rhs.shape),
               str(rhs.dtype), tuple(map(tuple, p["padding"])))
        groups[sig] = groups.get(sig, 0) + 1
    print(f"{len(groups)} unique stride-2 fwd conv signatures", flush=True)

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
        (lshape, ldt, rshape, rdt, padding) = sig
        Bx, H, W, Ci = lshape
        kh, kw, _, Co = rshape
        if kh != kw or kh % 2 == 0:
            print(f"  [{i + 1}] rhs{rshape}: non-square/even k — skipped")
            continue
        (pt, pb), (pl, pr) = padding
        Ho = (H + pt + pb - kh) // 2 + 1
        Wo = (W + pl + pr - kw) // 2 + 1
        dt = jnp.dtype(ldt)

        def conv(x, w, _p=padding):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding=_p,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def dgrad_xla(dy, w, _sh=lshape, _dt=dt):
            return jax.grad(
                lambda x: jnp.vdot(conv(x, w).astype(jnp.float32),
                                   dy.astype(jnp.float32)))(
                jnp.zeros(_sh, _dt))

        def dgrad_ph(dy, w, _k=kh):
            return dgrad_phase(dy, w, _k)

        f_xla = jax.jit(dgrad_xla)
        f_ph = jax.jit(dgrad_ph)
        try:
            w = (jax.random.normal(key, rshape, jnp.float32) * 0.2).astype(
                jnp.dtype(rdt))
            dy = (jax.random.normal(key, (Bx, Ho, Wo, Co), jnp.float32)
                  * 0.5).astype(dt)
            a = f_xla(dy, w)
            b = f_ph(dy, w)
            ref = np.asarray(a, np.float32)
            got = np.asarray(b, np.float32)
            scale = max(np.abs(ref).max(), 1e-6)
            err = np.abs(ref - got).max() / scale
            ok = err < (2e-2 if dt == jnp.bfloat16 else 1e-4)

            def bench(f):
                o = f(dy, w)
                _ = float(jnp.sum(o.astype(jnp.float32)))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = f(dy, w)
                _ = float(jnp.sum(o.astype(jnp.float32)))
                return max((time.perf_counter() - t0) / args.iters - overhead,
                           1e-9)

            t_xla = bench(f_xla)
            t_ph = bench(f_ph)
            del w, dy, a, b
        except Exception as e:
            print(f"  [{i + 1}] lhs{lshape} rhs{rshape} ERR "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        flops = 2.0 * Bx * Ho * Wo * kh * kw * Ci * Co  # useful MACs
        rows.append((sig, cnt, t_xla, t_ph, flops, err, ok))
        print(f"  [{i + 1}/{len(groups)}] lhs{lshape} rhs{rshape} x{cnt}"
              f": xla {t_xla * 1e3:7.2f} phase {t_ph * 1e3:7.2f} ms "
              f"({t_xla / t_ph:4.2f}x) "
              f"{flops / t_xla / 1e12:6.1f} -> {flops / t_ph / 1e12:6.1f} "
              f"TF/s err {err:.1e} {'OK' if ok else 'MISMATCH'}", flush=True)

    rows.sort(key=lambda r: -(r[2] * r[1]))
    tot_xla = sum(r[2] * r[1] for r in rows)
    tot_ph = sum(r[3] * r[1] for r in rows)
    tot_best = sum(min(r[2], r[3]) * r[1] for r in rows)
    print(f"\ndgrad population: xla {tot_xla * 1e3:.1f} ms, "
          f"all-phase {tot_ph * 1e3:.1f} ms, per-row-best "
          f"{tot_best * 1e3:.1f} ms")
    print("rows where phase wins (candidate substitutions):")
    for (sig, cnt, t_xla, t_ph, flops, err, ok) in rows:
        if ok and t_ph < t_xla * 0.95:
            print(f"  lhs{sig[0]} rhs{sig[2]} x{cnt}: "
                  f"{t_xla * 1e3:.2f} -> {t_ph * 1e3:.2f} ms "
                  f"(saves {(t_xla - t_ph) * cnt * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
