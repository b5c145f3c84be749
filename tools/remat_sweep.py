#!/usr/bin/env python
"""Remat x batch-size sweep of the YOLOX-s train step (VERDICT r3 #2).

`remat: true` (model yaml top level) wraps every CSP stage layer in
`nn.remat` (layers/blocks.py::maybe_remat) — activations inside a stage are
recomputed in the backward instead of living in HBM across it, trading
FLOPs for memory so batches beyond the B128 HBM ceiling become reachable
(B160 once CRASHED the worker and wedged the chip ~25 min; B192 regressed).

Safety: for every (batch, remat) point this tool first compiles the step
and reads XLA's `memory_analysis()`; if the projected peak exceeds
--hbm-cap (default 13.5 GiB of the 16 GiB chip) it reports the projection
and SKIPS execution rather than risk wedging the worker. Only points that
fit are actually timed (3 warmup + --iters steps, scalar-readback fenced —
block_until_ready lies through the axon tunnel).

`--assign-chunk N` additionally sweeps the SimOTA label-axis chunking
(loss: {assign_chunk: N} — losses/yolox.py::_simota_assign_chunked): the
B256 compile-OOM attribution showed the [B,100,8400] SimOTA cost temps are
the largest HBM tensors of the step, so chunking is the memory lever that
matters for batch >128 (0 = dense path).

Usage: python tools/remat_sweep.py [--batches 128,160,192,256]
       [--remat 0,1] [--assign-chunk 0,25] [--iters 10] [--hbm-cap-gib 13.5]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default="pl_yolo_tpu/configs/model/yolox_s.yaml")
    ap.add_argument("--batches", default="128,160,192,256")
    ap.add_argument("--remat", default="1",
                    help="comma list of 0/1 remat settings to sweep")
    ap.add_argument("--assign-chunk", default="0",
                    help="comma list of SimOTA assign_chunk values (0=dense)")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hbm-cap-gib", type=float, default=13.5)
    args = ap.parse_args()

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.layers.blocks import stem_input_s2d
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config

    S = args.size
    aug_cfg = AugmentConfig(max_labels=100)
    cap = args.hbm_cap_gib * 2**30
    rows = []

    combos = [(bool(int(r)), int(c))
              for r in args.remat.split(",")
              for c in args.assign_chunk.split(",")]
    for remat, chunk in combos:
        cfg = load_config(pathlib.Path(args.config))
        cfg["remat"] = remat
        if chunk:
            cfg["loss"]["assign_chunk"] = chunk
        model = build_model(cfg, num_classes=80)  # sets the ambient flag
        variables = model.init(jax.random.key(0), input_size=(S, S))
        tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)

        raw_apply = model.module.apply

        def s2d_apply(variables, images, train, **kw):
            with stem_input_s2d():
                return raw_apply(variables, images, train, **kw)

        for B in [int(b) for b in args.batches.split(",")]:
            state = TrainState.create(
                jax.tree.map(lambda x: np.array(x), variables), tx)
            step = make_train_step(
                s2d_apply, model.loss.train_loss,
                augment_fn=lambda r, i, l: device_augment(
                    r, i, l, aug_cfg, out_s2d=True))

            rng = np.random.default_rng(0)
            images = jnp.asarray(
                rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
            labels = np.zeros((B, 50, 5), np.float32)
            labels[:, :8, 0] = rng.integers(0, 80, (B, 8))
            labels[:, :8, 1:] = rng.uniform(50, 550, (B, 8, 4))
            labels = jnp.asarray(labels)

            t0 = time.perf_counter()
            try:
                compiled = jax.jit(step).lower(
                    state, images, labels, jax.random.key(0)).compile()
            except Exception as e:  # XLA compile-time OOM (B256 dense did this)
                print(f"B{B} remat={int(remat)} chunk={chunk}: COMPILE FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                rows.append((B, remat, chunk, None, None))
                continue
            t_compile = time.perf_counter() - t0
            mem = compiled.memory_analysis()
            peak = None
            if mem is not None:
                try:
                    peak = (mem.temp_size_in_bytes
                            + mem.argument_size_in_bytes
                            + mem.output_size_in_bytes
                            - getattr(mem, "alias_size_in_bytes", 0))
                except AttributeError:
                    peak = None
            tag = f"B{B} remat={int(remat)} chunk={chunk}"
            if peak is not None:
                print(f"{tag}: compiled in {t_compile:.0f}s, projected peak "
                      f"{peak / 2**30:.2f} GiB", flush=True)
                if peak > cap:
                    print(f"{tag}: SKIP execution (> {args.hbm_cap_gib} GiB "
                          f"cap — would risk wedging the worker)", flush=True)
                    rows.append((B, remat, chunk, peak, None))
                    continue
            else:
                print(f"{tag}: compiled in {t_compile:.0f}s, no "
                      f"memory_analysis available — proceeding carefully",
                      flush=True)

            try:
                for i in range(3):
                    state, losses = step(state, images, labels,
                                         jax.random.key(i))
                _ = float(losses["loss"])
                t0 = time.perf_counter()
                for i in range(args.iters):
                    state, losses = step(state, images, labels,
                                         jax.random.key(100 + i))
                _ = float(losses["loss"])
                ips = B * args.iters / (time.perf_counter() - t0)
            except Exception as e:
                print(f"{tag}: RUN FAILED {type(e).__name__}: {e}",
                      flush=True)
                rows.append((B, remat, chunk, peak, None))
                continue
            print(f"{tag}: {ips:.1f} img/s", flush=True)
            rows.append((B, remat, chunk, peak, ips))
            del state, images, labels, step, compiled

    print("\n| batch | remat | assign_chunk | projected peak HBM | img/s |")
    print("|---|---|---|---|---|")
    for (B, remat, chunk, peak, ips) in rows:
        pk = f"{peak / 2**30:.2f} GiB" if peak else "?"
        print(f"| {B} | {'on' if remat else 'off'} | {chunk or '-'} | {pk} | "
              f"{f'{ips:.1f}' if ips else 'skipped/failed'} |")


if __name__ == "__main__":
    main()
