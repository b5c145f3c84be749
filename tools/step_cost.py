#!/usr/bin/env python
"""Full-step roofline from XLA's OWN cost analysis of the optimized HLO.

tools/roofline.py bounds only the convs, from the *traced* jaxpr (pre-
fusion). This tool compiles the COMPLETE train step (augment + forward +
loss + backward + optimizer + EMA) for the attached backend and reads
`compiled.cost_analysis()` — FLOPs and bytes-accessed of the program
XLA actually emits, post-fusion. That turns "X ms measured vs Y ms conv
ceiling" into an itemized full-step bound:

    t_hbm  = bytes_accessed / HBM_BW     (every byte the compiled program
                                          moves to/from memory)
    t_mxu  = flops / PEAK
    floor  = max(t_hbm, t_mxu)

If the measured step time is close to `floor`, the remaining gap to the
conv-only roofline is *fundamental traffic* (BN stats, loss tensors,
augment pixels), not sub-roofline kernels.

Usage: python tools/step_cost.py [--batch 128] [--size 640]
       [--peak-tflops 197] [--hbm-gbps 819] [--measured-ms 253]

Multi-chip collective audit (VERDICT r3 #5): `--data 8 --devices 8 --cpu`
compiles the SAME train step over a virtual-CPU mesh and itemizes every
collective op in the optimized HLO (all-reduce / all-gather / reduce-
scatter / collective-permute / all-to-all) with its payload bytes, then
projects ICI time and DP scaling efficiency. Gradient all-reduce payload
is batch/resolution independent (it is the parameter size), so the audit
runs fine at small shapes. Composes with --model/--spatial for TP/SP halo
traffic.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "c64": 8, "f32": 4, "s32": 4,
                "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_COLL = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
         "all-to-all")


def collective_payloads(hlo_text: str):
    """Sum output-payload bytes per collective type from optimized HLO.

    Matches lines `%name = <shape> <op>(...)` where <shape> is a single
    `dtype[dims]{layout}` or a tuple thereof. '-start' variants count once
    ('-done' has no shape payload of its own in the async pair). Tuple
    shapes may contain `/*index=N*/` comment markers (XLA's all-reduce
    combiner groups many gradients into one variadic op — missing those
    undercounted the dp8 audit 20x), so the tuple branch matches to the
    closing paren, not to the first '='.

    TPU-compiled HLO adds brace-delimited layout annotations that contain
    parens of their own (`f32[8,128]{1,0:T(8,128)}`), which would stop the
    tuple branch at the first ')' inside a layout and silently drop the
    rest of a variadic payload — so all `{...}` groups are stripped first
    (layout/metadata braces don't nest in HLO text).
    """
    hlo_text = re.sub(r"\{[^{}]*\}", "", hlo_text)
    pat = re.compile(
        r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\]\S*)\s+"
        r"(" + "|".join(_COLL) + r")(-start)?\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    totals: dict[str, list] = {}
    for m in pat.finditer(hlo_text):
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        t = totals.setdefault(op, [0, 0])
        t[0] += 1
        t[1] += nbytes
    return {k: tuple(v) for k, v in totals.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--measured-ms", type=float, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="analyze the CPU-compiled program instead")
    ap.add_argument("--data", type=int, default=1, help="mesh 'data' size")
    ap.add_argument("--model-par", type=int, default=1,
                    help="mesh 'model' size")
    ap.add_argument("--spatial", type=int, default=1,
                    help="mesh 'spatial' size")
    ap.add_argument("--zero", type=int, nargs="?", const=1, default=0,
                    help="ZeRO level: 1 = optimizer-state sharding over "
                         "'data', 3 = params too (FSDP-style)")
    ap.add_argument("--devices", type=int, default=0,
                    help="force N virtual CPU devices (implies --cpu)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth for the projection "
                         "(v5e ~45 GB/s/direction)")
    args = ap.parse_args()

    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       flags).strip()
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices}").strip()
        args.cpu = True

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    B, S = args.batch, args.size
    cfg = load_config(pathlib.Path(args.config))
    model = build_model(cfg, num_classes=80)
    variables = model.init(jax.random.key(0), input_size=(S, S))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
    state = TrainState.create(variables, tx)
    aug_cfg = AugmentConfig(max_labels=100)
    step = make_train_step(
        model.module.apply, model.loss.train_loss,
        augment_fn=lambda r, i, l: device_augment(r, i, l, aug_cfg),
        donate=False)

    images = jnp.zeros((B, S, S, 3), jnp.float32)
    labels = jnp.zeros((B, 50, 5), jnp.float32)

    n_par = args.data * args.model_par * args.spatial
    mesh = None
    if n_par > 1:
        from pl_yolo_tpu.parallel.mesh import (make_mesh, shard_batch,
                                               shard_tp, sp_constraint,
                                               zero_constraint)
        mesh = make_mesh(args.data, args.model_par, args.spatial,
                         devices=jax.devices()[:n_par])
        state = shard_tp(state, mesh, zero=args.zero)
        step = make_train_step(
            model.module.apply, model.loss.train_loss,
            augment_fn=lambda r, i, l: device_augment(r, i, l, aug_cfg),
            donate=False,
            constrain_images=(sp_constraint(mesh) if args.spatial > 1
                              else None),
            constrain_state=(zero_constraint(state, mesh, zero=args.zero)
                             if args.zero
                             else None))
        sharded = shard_batch(mesh, {"images": images, "labels": labels})
        images, labels = sharded["images"], sharded["labels"]

    if mesh is not None:
        with mesh:
            lowered = step.lower(state, images, labels, jax.random.key(0))
            compiled = lowered.compile()
    else:
        lowered = step.lower(state, images, labels, jax.random.key(0))
        compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    # per-memory-space breakdown when the backend provides it
    spaces = {k: v for k, v in ca.items() if k.startswith("bytes accessed")}

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9
    t_mxu = flops / peak
    t_hbm = bytes_acc / bw
    floor = max(t_mxu, t_hbm)
    print(f"backend: {jax.devices()[0].platform}")
    print(f"compiled-step FLOPs        : {flops / 1e12:8.2f} TF")
    print(f"compiled-step bytes access : {bytes_acc / 2**30:8.2f} GiB")
    for k, v in sorted(spaces.items()):
        print(f"    {k:<40s} {v / 2**30:8.2f} GiB")
    print(f"t_mxu  = {t_mxu * 1e3:7.1f} ms   (at {args.peak_tflops:.0f} TF/s)")
    print(f"t_hbm  = {t_hbm * 1e3:7.1f} ms   (at {args.hbm_gbps:.0f} GB/s)")
    print(f"floor  = {floor * 1e3:7.1f} ms   => {B / floor:.0f} img/s bound")
    if args.measured_ms:
        print(f"measured {args.measured_ms:.1f} ms = "
              f"{args.measured_ms / (floor * 1e3):.2f}x the compiled-HLO "
              f"floor ({100 * floor * 1e3 / args.measured_ms:.0f}% of "
              f"roofline)")

    if mesh is not None:
        coll = collective_payloads(compiled.as_text())
        n = n_par
        print(f"\ncollectives in the optimized HLO "
              f"(dp{args.data} x tp{args.model_par} x sp{args.spatial}"
              f"{f' +zero{args.zero}' if args.zero else ''}, per-device program):")
        if not coll:
            print("  none")
        tot_bytes = 0
        for op, (count, nbytes) in sorted(coll.items(),
                                          key=lambda kv: -kv[1][1]):
            print(f"  {op:<20s} x{count:<4d} payload {nbytes / 2**20:9.2f} "
                  f"MiB")
            tot_bytes += nbytes
        param_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(state.params))
        print(f"  (parameter bytes for reference: "
              f"{param_bytes / 2**20:.2f} MiB)")
        # ring cost on the slowest link: all-reduce moves 2(n-1)/n x payload,
        # all-gather/reduce-scatter (n-1)/n x payload; use the AR factor for
        # everything as the conservative envelope. No compute overlap assumed.
        wire = tot_bytes * 2 * (n - 1) / n
        t_ici = wire / (args.ici_gbps * 1e9)
        print(f"  conservative ICI wire bytes {wire / 2**20:.2f} MiB -> "
              f"{t_ici * 1e3:.2f} ms at {args.ici_gbps:.0f} GB/s")
        if args.measured_ms:
            eff = args.measured_ms / (args.measured_ms + t_ici * 1e3)
            print(f"  projected DP-scaling efficiency vs the "
                  f"{args.measured_ms:.0f} ms single-chip step: "
                  f"{100 * eff:.1f}% (zero-overlap worst case)")


if __name__ == "__main__":
    main()
