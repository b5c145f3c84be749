"""Component breakdown of device_augment on the real TPU.

Times jit'd device_augment under configs that statically disable components,
plus a y-pass-as-matmul sampler variant (gathers vs MXU).
Run: python tools/perf_aug2.py [batch [size]]
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
    key = jax.random.key(0)

    def run(name, cfg):
        f = jax.jit(lambda k, i, l: aug.device_augment(k, i, l, cfg))
        dt = timeit(f, key, images, labels)
        print(f"{name:28s}: {dt * 1e3:7.2f} ms", flush=True)
        return dt * 1e3

    C = aug.AugmentConfig
    base = dict(max_labels=100)
    res = {}
    res["none"] = run("none (overhead)", C(mosaic_prob=0, mixup_prob=0,
                                           hsv_prob=0, flip_prob=0, **base))
    res["hsv"] = run("hsv only", C(mosaic_prob=0, mixup_prob=0, hsv_prob=0.5,
                                   flip_prob=0, **base))
    res["flip"] = run("flip only", C(mosaic_prob=0, mixup_prob=0, hsv_prob=0,
                                     flip_prob=0.5, **base))
    res["mosaic"] = run("mosaic only", C(mosaic_prob=0.9, mixup_prob=0,
                                         hsv_prob=0, flip_prob=0, **base))
    res["mosaic+mixup"] = run("mosaic+mixup",
                              C(mosaic_prob=0.9, mixup_prob=1.0, hsv_prob=0,
                                flip_prob=0, **base))
    res["full"] = run("full", C(**base))

    # --- y-pass as one-hot matmul instead of jnp.take row gathers
    orig = aug.separable_bilinear

    def separable_mm(img, xs, ys, fill=aug.FILL):
        h, w = img.shape[:2]
        c = img.shape[2]
        vy = (ys >= 0) & (ys <= h - 1)
        vx = (xs >= 0) & (xs <= w - 1)
        ys_c = jnp.clip(ys, 0.0, h - 1)
        xs_c = jnp.clip(xs, 0.0, w - 1)
        y0 = jnp.floor(ys_c).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fy = (ys_c - y0).astype(img.dtype)
        iota_h = jnp.arange(h, dtype=jnp.int32)[None, :]
        wy = ((iota_h == y0[:, None]) * (1 - fy)[:, None]
              + (iota_h == y1[:, None]) * fy[:, None]).astype(img.dtype)
        rows = jax.lax.dot_general(
            wy, img.reshape(h, w * c), (((1,), (0,)), ((), ())),
            preferred_element_type=img.dtype).reshape(-1, w, c)
        x0 = jnp.floor(xs_c).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fx = (xs_c - x0).astype(img.dtype)
        iota = jnp.arange(w, dtype=jnp.int32)[None, :]
        sel = ((iota == x0[:, None]) * (1 - fx)[:, None]
               + (iota == x1[:, None]) * fx[:, None]).astype(img.dtype)
        out = jax.lax.dot_general(rows, sel, (((1,), (1,)), ((), ())),
                                  preferred_element_type=img.dtype)
        out = out.transpose(0, 2, 1)
        mask = vy[:, None] & vx[None, :]
        return jnp.where(mask[..., None], out, jnp.asarray(fill, img.dtype))

    aug.separable_bilinear = separable_mm
    res["mosaic_mm"] = run("mosaic only (y-matmul)",
                           C(mosaic_prob=0.9, mixup_prob=0, hsv_prob=0,
                             flip_prob=0, **base))
    res["full_mm"] = run("full (y-matmul)", C(**base))
    aug.separable_bilinear = orig
    print({k: round(v, 2) for k, v in res.items()})


if __name__ == "__main__":
    main()
