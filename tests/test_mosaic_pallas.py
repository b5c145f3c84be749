"""Pallas mosaic-sampling kernel vs the jnp canvas+sampler path.

The kernel runs its matmuls with bf16 operands (f32 accumulate) for
full-rate MXU — worst-case ~1% relative pixel error (~2.5 grey levels on
0-255 data), immaterial for training augmentation; tolerances here pin
that bound rather than exact equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_yolo_tpu.data.augment import FILL, batched_separable
from pl_yolo_tpu.ops.pallas.mosaic_pallas import mosaic_sample


def _geometry(rng, b, h, w, scale):
    """Random mosaic geometry mirroring _mosaic_prepare's distributions."""
    oxw, oyw, xs, ys = [], [], [], []
    for _ in range(b):
        cxw = int(rng.integers(w // 2, 3 * w // 2 + 1))
        cyw = int(rng.integers(h // 2, 3 * h // 2 + 1))
        oxw.append([cxw - w, cxw, cxw - w, cxw])
        oyw.append([cyw - h, cyw - h, cyw, cyw])
        s = float(rng.uniform(*scale))
        tx = float(rng.uniform(0.4, 0.6)) * w
        ty = float(rng.uniform(0.4, 0.6)) * h
        # window coords: src = (dst - t)/s + center-ish (matches the
        # separable affine inverse's form; exact constants don't matter
        # for the equivalence check)
        xs.append((np.arange(w) - tx) / s + w * 0.5)
        ys.append((np.arange(h) - ty) / s + h * 0.5)
    return (np.asarray(oxw, np.int32), np.asarray(oyw, np.int32),
            np.asarray(xs, np.float32), np.asarray(ys, np.float32))


def _reference(tiles, oxw, oyw, xs_raw, ys_raw):
    """Canvas-paste + batched separable sampling (the jnp path)."""
    b, _, h, w, _ = tiles.shape
    mh, mw = h // 2, w // 2
    canvas = np.full((b, 3 * h, 3 * w, 3), FILL, tiles.dtype)
    for i in range(b):
        for k in range(4):
            y, x = oyw[i, k] + mh, oxw[i, k] + mw
            canvas[i, y:y + h, x:x + w] = tiles[i, k]
    window = canvas[:, mh:mh + 2 * h, mw:mw + 2 * w]
    xs = np.where((xs_raw >= 0) & (xs_raw < 2 * w), xs_raw, -1e9)
    ys = np.where((ys_raw >= 0) & (ys_raw < 2 * h), ys_raw, -1e9)
    return np.asarray(batched_separable(
        jnp.asarray(window), jnp.asarray(xs), jnp.asarray(ys)))


@pytest.mark.parametrize("scale", [(0.6, 0.9), (1.2, 1.9), (0.5, 2.0)])
def test_kernel_matches_jnp_path(scale):
    rng = np.random.default_rng(hash(scale) % 2**31)
    b, h, w = 2, 64, 64
    tiles = rng.uniform(0, 255, (b, 4, h, w, 3)).astype(np.float32)
    oxw, oyw, xs, ys = _geometry(rng, b, h, w, scale)
    want = _reference(tiles, oxw, oyw, xs, ys)
    got = np.asarray(mosaic_sample(
        jnp.asarray(tiles), jnp.asarray(oxw), jnp.asarray(oyw),
        jnp.asarray(xs), jnp.asarray(ys), max_scale=2.0, interpret=True))
    np.testing.assert_allclose(got, want, atol=3.0)  # bf16 operand rounding
    assert np.mean(np.abs(got - want)) < 0.5  # systematic error would show


def test_kernel_bf16():
    rng = np.random.default_rng(5)
    b, h, w = 2, 64, 64
    tiles = rng.uniform(0, 255, (b, 4, h, w, 3)).astype(np.float32)
    oxw, oyw, xs, ys = _geometry(rng, b, h, w, (0.8, 1.5))
    want = _reference(tiles, oxw, oyw, xs, ys)
    got = np.asarray(mosaic_sample(
        jnp.asarray(tiles, jnp.bfloat16), jnp.asarray(oxw), jnp.asarray(oyw),
        jnp.asarray(xs), jnp.asarray(ys), interpret=True)).astype(np.float32)
    # bf16 pixels + bf16 operands: a few grey levels
    np.testing.assert_allclose(got, want, atol=4.0)


def test_warp_sample_matches_separable_bilinear():
    """1-tile warp (mixup partner path): kernel == jnp sampler, including
    flipped (decreasing) grids and out-of-range fill."""
    from pl_yolo_tpu.data.augment import separable_bilinear
    from pl_yolo_tpu.ops.pallas.mosaic_pallas import warp_sample

    rng = np.random.default_rng(11)
    b, h, w = 3, 64, 64
    imgs = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    xs, ys = [], []
    for i in range(b):
        f = rng.uniform(0.5, 1.5)
        xo = rng.uniform(0, max(w * f - w, 0))
        yo = rng.uniform(0, max(h * f - h, 0))
        x = (np.arange(w) + xo + 0.5) / f - 0.5
        if i % 2:
            x = x[::-1].copy()          # flip: decreasing coords
        xs.append(x)
        ys.append((np.arange(h) + yo + 0.5) / f - 0.5)
    xs = np.asarray(xs, np.float32)
    ys = np.asarray(ys, np.float32)

    want = np.stack([
        np.asarray(separable_bilinear(jnp.asarray(imgs[i]),
                                      jnp.asarray(xs[i]),
                                      jnp.asarray(ys[i]), fill=0.0))
        for i in range(b)])
    got = np.asarray(warp_sample(jnp.asarray(imgs), jnp.asarray(xs),
                                 jnp.asarray(ys), fill=0.0, interpret=True))
    np.testing.assert_allclose(got, want, atol=3.0)  # bf16 operand rounding
    assert np.mean(np.abs(got - want)) < 0.5


def test_mosaic_sample_idx_matches_gathered_tiles():
    """Scalar-prefetch pool indexing == explicit host-side tile gather."""
    from pl_yolo_tpu.ops.pallas.mosaic_pallas import (
        from_chw, mosaic_sample, mosaic_sample_idx, to_chw)

    rng = np.random.default_rng(21)
    b, h, w = 3, 64, 64
    batch = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    tidx = np.stack([np.roll(np.arange(b), -i) for i in range(4)],
                    axis=1).astype(np.int32)          # self + 3 partners
    oxw, oyw, xs, ys = _geometry(rng, b, h, w, (0.6, 1.8))

    tiles = batch[tidx]                               # [B,4,H,W,3]
    want = np.asarray(mosaic_sample(
        jnp.asarray(tiles), jnp.asarray(oxw), jnp.asarray(oyw),
        jnp.asarray(xs), jnp.asarray(ys), interpret=True))
    got = np.asarray(from_chw(mosaic_sample_idx(
        to_chw(jnp.asarray(batch)), jnp.asarray(tidx), jnp.asarray(oxw),
        jnp.asarray(oyw), jnp.asarray(xs), jnp.asarray(ys), interpret=True)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_device_augment_chw_path_matches_jnp_path():
    """END-TO-END: device_augment with use_pallas='interpret' (the full
    channel-major Pallas pipeline: pool fetch -> mosaic/mixup warp -> chw
    HSV/flip/blends -> final NHWC transpose) == the NHWC jnp path, pixels
    to bf16/kernel tolerance and labels exactly."""
    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment

    rng = np.random.default_rng(31)
    b, h, w = 4, 64, 64
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    labels = np.zeros((b, 10, 5), np.float32)
    labels[:, :3, 0] = rng.integers(0, 3, (b, 3))
    labels[:, :3, 1:] = rng.uniform(10, 50, (b, 3, 4))
    labels = jnp.asarray(labels)
    base = dict(max_labels=20, mosaic_prob=1.0, mixup_prob=1.0,
                hsv_prob=1.0, flip_prob=0.5, pixel_dtype="float32")
    key = jax.random.key(7)
    img_ref, lab_ref = device_augment(
        key, images, labels, AugmentConfig(**base, use_pallas="off"))
    img_chw, lab_chw = device_augment(
        key, images, labels, AugmentConfig(**base, use_pallas="interpret"))
    assert img_ref.shape == img_chw.shape == (b, h, w, 3)
    np.testing.assert_array_equal(np.asarray(lab_ref), np.asarray(lab_chw))
    # pixel tolerance: bf16-operand matmuls give ~2 grey levels; HSV's hue
    # sector selects can locally amplify that near max-channel ties, so the
    # max bound is loose while the mean stays tight
    diff = np.abs(np.asarray(img_ref) - np.asarray(img_chw))
    assert diff.max() < 12.0, diff.max()
    assert diff.mean() < 0.5, diff.mean()


def test_topk_pallas_matches_lax_topk():
    """VMEM-resident top-k kernel == lax.top_k values, incl. tie-heavy and
    -inf rows (interpret mode)."""
    from pl_yolo_tpu.ops.pallas.topk_pallas import topk_pallas

    rng = np.random.default_rng(41)
    x = rng.uniform(0, 1, (3, 7, 500)).astype(np.float32)
    x[x < 0.6] = 0.0                       # heavy ties at zero
    x[0, 0] = -np.inf                      # degenerate row
    x[1, 2, :5] = 0.7                      # tied maxima
    want = np.asarray(jax.lax.top_k(jnp.asarray(x), 10)[0])
    got = np.asarray(topk_pallas(jnp.asarray(x), 10, interpret=True))
    np.testing.assert_allclose(got, want)

    # under vmap (simota_assign vmaps over the batch)
    got_v = np.asarray(jax.vmap(
        lambda r: topk_pallas(r, 10, interpret=True))(jnp.asarray(x)))
    np.testing.assert_allclose(got_v, want)
