#!/usr/bin/env python
"""Per-conv MXU + HBM roofline for the train step (VERDICT r2 #2).

Traces the forward AND backward jaxpr (trace only — no compile, runs on
CPU), extracts every `conv_general_dilated` — forward, grad-input, and
grad-filter convs all appear, each with its own matmul role assignment
read from `dimension_numbers` — and computes per-conv:

  * FLOPs = 2 * M * K * N  (M = rows of the implied matmul, K = taps *
    in-features-per-group, N = out-features)
  * MXU packing efficiency: the 128x128 systolic array processes a
    [M,K]x[K,N/g] matmul in ceil(K/128)*ceil(N/g/128) passes of full
    tiles, so eff = (K/ceil128(K)) * ((N/g)/ceil128(N/g)); a C=32
    early-stage conv can use at most ~37% of the array no matter what.
  * t_mxu = FLOPs / (PEAK * eff)
  * t_hbm = bf16 bytes of (lhs + rhs + out) / HBM bandwidth — the
    memory-bound floor assuming each operand is read/written from HBM
    exactly once (perfect fusion; no multi-pass).
  * attainable = max(t_mxu, t_hbm)  — the classic roofline.

Summing attainable over all convs gives the architecture-imposed ceiling
for the conv portion of the step. Compare against the measured step time
(`--measured-ms`, e.g. from tools/profile_step.py) to judge headroom: if
sum(attainable) is close to the measured conv time, the implementation is
at the hardware limit for this model's shapes — a property of YOLOX-s
(few channels, huge spatial extents at strides 4/8), not of the code.

Usage: python tools/roofline.py [--batch 128] [--size 640]
       [--peak-tflops 197] [--hbm-gbps 819] [--measured-ms 253]
(defaults: TPU v5e — 197 bf16 TFLOP/s, 819 GB/s HBM.)
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _ceil128(x: int) -> int:
    return max(128, 128 * math.ceil(x / 128))


def collect_convs(jaxpr, out):
    """Recursively collect conv_general_dilated eqns as
    (M, K, N, lhs_elems, rhs_elems, out_elems, label) with the matmul roles
    read from dimension_numbers (fwd, grad-input, and grad-filter convs all
    appear in the traced jaxpr with different role assignments)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs = tuple(eqn.invars[0].aval.shape)
            rhs = tuple(eqn.invars[1].aval.shape)
            res = tuple(eqn.outvars[0].aval.shape)
            dn = eqn.params["dimension_numbers"]
            fgc = eqn.params.get("feature_group_count", 1)
            bgc = eqn.params.get("batch_group_count", 1)
            # out_spec: (batch, feature, *spatial); rhs_spec: (out_f, in_f, *sp)
            n = res[dn.out_spec[1]]
            m = res[dn.out_spec[0]]
            for d in dn.out_spec[2:]:
                m *= res[d]
            k = rhs[dn.rhs_spec[1]]
            for d in dn.rhs_spec[2:]:
                k *= rhs[d]
            nelem = lambda s: math.prod(s)
            label = (tuple(rhs[d] for d in dn.rhs_spec[2:]),
                     rhs[dn.rhs_spec[1]] * fgc // bgc, n)
            out.append((m, k, n, fgc, nelem(lhs), nelem(rhs), nelem(res),
                        label))
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                collect_convs(sub.jaxpr, out)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        collect_convs(s.jaxpr, out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak (v5e ~197, v5p ~459)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth (v5e 819, v5p 2765 GB/s)")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured full-step ms to compare against")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.utils.config import load_config

    cfg = load_config(pathlib.Path(args.config))
    model = build_model(cfg, num_classes=80)
    B, S = args.batch, args.size
    variables = model.init(jax.random.key(0), input_size=(S, S))

    def loss_fn(v, x, y):
        outs = model.module.apply(v, x, True,
                                  rngs={"dropout": jax.random.key(0)},
                                  mutable=["batch_stats"])[0]
        return model.loss.train_loss(outs, y)["loss"]

    x = jnp.zeros((B, S, S, 3), jnp.float32)
    y = jnp.zeros((B, 50, 5), jnp.float32)
    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(variables, x, y)
    convs = collect_convs(jaxpr.jaxpr, [])

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9
    BYTES = 2  # bf16 compute dtype on the conv path
    by_shape = defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0])
    total_flops = total_mxu = total_hbm = total_attain = 0.0
    for m, k, n, fgc, lhs_e, rhs_e, out_e, label in convs:
        flops = 2.0 * m * k * n
        ng = max(n // fgc, 1)  # per-group out-features on the MXU
        eff = (k / _ceil128(k)) * (ng / _ceil128(ng))
        t_mxu = flops / (peak * eff) if eff else 0.0
        t_hbm = BYTES * (lhs_e + rhs_e + out_e) / bw
        attain = max(t_mxu, t_hbm)
        total_flops += flops
        total_mxu += t_mxu
        total_hbm += t_hbm
        total_attain += attain
        agg = by_shape[label]
        agg[0] += 1
        agg[1] += flops
        agg[2] += t_mxu
        agg[3] += t_hbm
        agg[4] += attain
    print(f"convs traced (fwd+bwd): {len(convs)}   "
          f"total conv FLOPs/step: {total_flops / 1e12:.2f} TF")
    print(f"{'kernel (taps, cin, nout)':>28} {'count':>5} {'GFLOPs':>9} "
          f"{'mxu ms':>8} {'hbm ms':>8} {'attain ms':>9} {'bound':>6}")
    for key, (cnt, fl, tm, th, at) in sorted(
            by_shape.items(), key=lambda kv: -kv[1][4]):
        bound = "HBM" if th > tm else "MXU"
        print(f"{str(key):>28} {cnt:>5} {fl / 1e9:>9.1f} {tm * 1e3:>8.2f} "
              f"{th * 1e3:>8.2f} {at * 1e3:>9.2f} {bound:>6}")
    print(f"\nsum of per-conv bounds @v5e-class "
          f"({args.peak_tflops:.0f} TF, {args.hbm_gbps:.0f} GB/s):")
    print(f"  MXU-packing bound : {total_mxu * 1e3:7.1f} ms/step "
          f"(weighted packing eff {total_flops / (peak * total_mxu):.2f})")
    print(f"  HBM-traffic bound : {total_hbm * 1e3:7.1f} ms/step "
          f"({BYTES * 1e-9 * sum(c[4] + c[5] + c[6] for c in convs):.1f} GB "
          f"perfectly-fused conv traffic)")
    print(f"  roofline (max/conv): {total_attain * 1e3:6.1f} ms/step "
          f"(batch {B}) => {B / total_attain:.0f} img/s conv-only ceiling")
    if args.measured_ms:
        frac = total_attain * 1e3 / args.measured_ms
        print(f"  measured step {args.measured_ms:.1f} ms => conv roofline is "
              f"{100 * frac:.0f}% of it; remaining {100 * (1 - frac):.0f}% = "
              f"non-conv work + unfused traffic + sub-roofline kernels")


if __name__ == "__main__":
    main()
