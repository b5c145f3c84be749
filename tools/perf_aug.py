"""TPU micro-benchmark for the device-side augmentation pipeline.

Times device_augment (mosaic+affine+mixup+HSV+flip) at B64/640 with the
current sampler vs the legacy einsum x-pass, printing ms/step for each.
Run on the real chip: python tools/perf_aug.py [batch [size]]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, iters=10, warmup=3):
    import jax.numpy as jnp

    r = None
    for _ in range(warmup):
        r = f(*args)
    # scalar readback fences through the axon tunnel (block_until_ready lies)
    _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import pl_yolo_tpu.data.augment as aug

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)),
                         jnp.float32)
    labels = np.zeros((batch, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (batch, 8))
    labels[:, :8, 1:] = rng.uniform(50, size - 100, (batch, 8, 4))
    labels = jnp.asarray(labels)
    cfg = aug.AugmentConfig(max_labels=100)
    key = jax.random.key(0)

    def legacy_separable(img, xs, ys, fill=aug.FILL):
        h, w = img.shape[:2]
        vy = (ys >= 0) & (ys <= h - 1)
        vx = (xs >= 0) & (xs <= w - 1)
        ys = jnp.clip(ys, 0.0, h - 1)
        xs = jnp.clip(xs, 0.0, w - 1)
        y0 = jnp.floor(ys).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fy = (ys - y0)[:, None, None].astype(img.dtype)
        rows = (jnp.take(img, y0, axis=0) * (1 - fy)
                + jnp.take(img, y1, axis=0) * fy)
        x0 = jnp.floor(xs).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fx = (xs - x0).astype(img.dtype)
        iota = jnp.arange(w, dtype=jnp.int32)[None, :]
        sel = ((iota == x0[:, None]) * (1 - fx)[:, None]
               + (iota == x1[:, None]) * fx[:, None]).astype(img.dtype)
        out = jnp.einsum("wc,hck->hwk", sel, rows,
                         preferred_element_type=img.dtype)
        mask = vy[:, None] & vx[None, :]
        return jnp.where(mask[..., None], out, jnp.asarray(fill, img.dtype))

    current = aug.separable_bilinear

    results = {}
    for name, impl in [("current(dot_general)", current),
                       ("legacy(einsum)", legacy_separable)]:
        aug.separable_bilinear = impl
        f = jax.jit(lambda k, i, l: aug.device_augment(k, i, l, cfg))
        dt = timeit(f, key, images, labels)
        results[name] = dt * 1e3
        print(f"{name}: {dt * 1e3:.2f} ms  "
              f"({batch / dt:.0f} img/s)", flush=True)
    aug.separable_bilinear = current
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
