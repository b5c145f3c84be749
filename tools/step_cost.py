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
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


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
    args = ap.parse_args()

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


if __name__ == "__main__":
    main()
