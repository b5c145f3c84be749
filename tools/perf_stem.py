#!/usr/bin/env python
"""A/B the stem formulation for TRAIN (fwd+wgrad), not just fwd.

r2's perf_model.py picked the fused 6x6-stride-2 conv over the reference's
Focus (space-to-depth + 3x3-s1) on FORWARD time. tools/perf_conv.py (r3)
then showed the 6x6-s2 stem's grad-filter conv is the single worst row of
the whole step: 5.9 ms standalone at 15 TFLOP/s (x3.2 its roofline bound) —
the rhs-dilated 6x6 window over the 640^2 3-channel input packs terribly.

The two stems are mathematically identical (Focus: yolox network_blocks.py
Focus class; the 6x6 kernel is the 3x3-on-12ch kernel scattered over the
2x2 phase grid), so the choice is purely a performance one and SHOULD be
made on fwd+bwd, which this tool measures:

  A  conv6x6s2 on [B,S,S,3]          (current production stem)
  B  space-to-depth(2) -> conv3x3s1 on [B,S/2,S/2,12]
  C  B, but s2d input precomputed    (what the augment pipeline could emit)

Usage: python tools/perf_stem.py [--batch 128] [--size 640] [--iters 30]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cout", type=int, default=32)
    args = ap.parse_args()

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, S, C = args.batch, args.size, args.cout
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.float32).astype(jnp.bfloat16)
    w66 = jax.random.normal(key, (6, 6, 3, C), jnp.float32).astype(
        jnp.bfloat16) * 0.05
    w33 = jax.random.normal(key, (3, 3, 12, C), jnp.float32).astype(
        jnp.bfloat16) * 0.05

    dn = jax.lax.conv_dimension_numbers((B, S, S, 3), (6, 6, 3, C),
                                        ("NHWC", "HWIO", "NHWC"))

    def s2d(img):
        b, h, w, c = img.shape
        img = img.reshape(b, h // 2, 2, w // 2, 2, c)
        return img.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                       4 * c)

    def stem_a(w, img):
        y = jax.lax.conv_general_dilated(
            img, w, (2, 2), [(2, 2), (2, 2)], dimension_numbers=dn)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def stem_b(w, img):
        y = jax.lax.conv_general_dilated(
            s2d(img), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (B, S // 2, S // 2, 12), (3, 3, 12, C),
                ("NHWC", "HWIO", "NHWC")))
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    x12 = s2d(x)

    def stem_c(w, img12):
        y = jax.lax.conv_general_dilated(
            img12, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (B, S // 2, S // 2, 12), (3, 3, 12, C),
                ("NHWC", "HWIO", "NHWC")))
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def bench(name, f, w, inp):
        g = jax.jit(jax.grad(f))
        out = g(w, inp)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = g(w, inp)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:28s} fwd+wgrad {t:7.2f} ms", flush=True)
        return t

    ta = bench("A conv6x6s2 (production)", stem_a, w66, x)
    tb = bench("B s2d + conv3x3s1", stem_b, w33, x)
    tc = bench("C conv3x3s1 (s2d input)", stem_c, w33, x12)
    print(f"\nB vs A: {ta - tb:+.2f} ms   C vs A: {ta - tc:+.2f} ms "
          f"(positive = faster than production)")


if __name__ == "__main__":
    main()
