"""Mixup-partner jitter geometry (reference mosaic_detection.py:169-240):
scale by jit_factor, 50% flip, zero-pad, random-crop — pixels and labels must
ride the same transform (VERDICT r1 #6)."""

import jax
import jax.numpy as jnp
import numpy as np

from pl_yolo_tpu.data.augment import AugmentConfig, _mixup_transform


def _scene():
    """64x64 black image with a white 8x8 square at rows/cols 8..16."""
    img = np.zeros((64, 64, 3), np.float32)
    img[8:16, 8:16] = 255.0
    labels = np.zeros((10, 5), np.float32)
    labels[0] = [2, 12, 12, 8, 8]  # cls, cx, cy, w, h
    return jnp.asarray(img), jnp.asarray(labels)


def _run(seed, scale):
    img, labels = _scene()
    cfg = AugmentConfig(mixup_scale=scale, max_labels=10)
    out, cand, valid = jax.jit(
        lambda k: _mixup_transform(k, img, labels, cfg)
    )(jax.random.key(seed))
    return np.asarray(out), np.asarray(cand), np.asarray(valid)


def test_identity_scale_is_copy_or_mirror():
    saw = set()
    for seed in range(8):
        out, cand, valid = _run(seed, (1.0, 1.0))
        img, labels = _scene()
        img, labels = np.asarray(img), np.asarray(labels)
        if np.allclose(out, img, atol=1e-3):
            saw.add("plain")
            np.testing.assert_allclose(cand[0], labels[0], atol=1e-4)
        elif np.allclose(out, img[:, ::-1], atol=1e-3):
            saw.add("flip")
            # cx mirrors about the width: 64 - 12 = 52
            np.testing.assert_allclose(cand[0], [2, 52, 12, 8, 8], atol=1e-4)
        else:
            raise AssertionError(f"seed {seed}: neither copy nor mirror")
        assert valid[0] and not valid[1:].any()
    assert saw == {"plain", "flip"}, "both flip branches must occur"


def test_downscale_geometry():
    """f=0.5: the white square lands at half coords (or mirrored about the
    scaled width), surrounding area is zero-padded; labels follow."""
    saw = set()
    for seed in range(8):
        out, cand, valid = _run(seed, (0.5, 0.5))
        assert valid[0]
        lum = out[..., 0]
        if cand[0, 1] < 16:  # no flip: box at cx=6, cy=6, w=h=4
            saw.add("plain")
            np.testing.assert_allclose(cand[0], [2, 6, 6, 4, 4], atol=1e-3)
            assert lum[5:7, 5:7].min() > 200
        else:  # flip about sw=32: cx = 32 - 6 = 26
            saw.add("flip")
            np.testing.assert_allclose(cand[0], [2, 26, 6, 4, 4], atol=1e-3)
            assert lum[5:7, 25:27].min() > 200
        # bottom/right half of the crop is past the scaled image -> zero pad
        assert np.abs(out[40:, :]).max() == 0.0
        assert np.abs(out[:, 40:]).max() == 0.0
    assert saw == {"plain", "flip"}


def test_upscale_crops_and_scales_labels():
    """f=2: the output is a random crop of the 2x image; the (clipped) box
    must cover exactly the bright pixels."""
    for seed in range(6):
        out, cand, valid = _run(seed, (2.0, 2.0))
        lum = out[..., 0]
        ys, xs = np.nonzero(lum > 128)
        if len(ys) == 0:  # square cropped fully out
            assert not valid[0] or cand[0, 3] <= 2 or cand[0, 4] <= 2
            continue
        assert valid[0]
        cx, cy, w, h = cand[0, 1:]
        np.testing.assert_allclose([xs.min(), xs.max() + 1],
                                   [cx - w / 2, cx + w / 2], atol=1.5)
        np.testing.assert_allclose([ys.min(), ys.max() + 1],
                                   [cy - h / 2, cy + h / 2], atol=1.5)


def test_mixup_scale_knob_changes_output():
    out1, _, _ = _run(3, (1.0, 1.0))
    out2, _, _ = _run(3, (1.6, 1.6))
    assert not np.allclose(out1, out2)
