"""Device-side augmentation: fused mosaic + random-affine + mixup + HSV + flip.

Capability parity with the reference host-side pipeline
(models/data/mosaic_detection.py:62-240 mosaic/random_perspective/mixup and
models/data/augmentation/data_augments.py:6-137 HSV/flip), re-architected as
ONE jit-compiled batched program:

  * Mosaic composes the 4 letterboxed tiles onto a margin canvas with
    `lax.dynamic_update_slice` (a dense TPU op — no gathers), exactly the
    reference's paste-with-crop (mosaic_detection.py:101-125; the 0.5-tile
    margin absorbs out-of-canvas overhang so DUS clamping never shifts a
    tile).
  * The random affine (scale `mosaic_scale`, translate; random_perspective,
    mosaic_detection.py:269-358) samples the canvas SEPARABLY: per-axis
    1D index vectors + `jnp.take` per bilinear tap. TPU gathers with full
    [H,W] index grids run ~40ms/tap/batch8@640 while shared per-axis takes
    run ~4ms — this is the difference between augmentation dominating the
    step and disappearing into it. Rotation/shear (off in every shipped
    config: degrees=0; shear is a ±2° garnish) are supported through a
    general-gather fallback selected automatically when configured.
  * Mosaic partners are in-batch permutations; ALL randomness is device-side
    PRNG keyed per step, so the host loader stays decode-only and the whole
    train step stays one compiled program.
  * Labels ride the same affine as fixed-shape [4M] candidate sets with
    validity masks + top-max_labels compaction (the reference's dynamic
    box_candidates filtering, mosaic_detection.py:361-373, as masking).

Images are float32 0..255 throughout (the reference's preproc does not
normalize, data_augments.py:90-106); fill value is 114.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


FILL = 114.0


class AugmentConfig(NamedTuple):
    """Mirrors the data-yaml `transform` section (configs/data/coco2017.yaml)."""
    mosaic_prob: float = 0.9
    mosaic_scale: tuple = (0.1, 2.0)
    degrees: float = 0.0
    translate: float = 0.1
    shear: float = 0.0
    perspective: float = 0.0  # accepted for config parity; affine path only
    mixup_prob: float = 1.0
    mixup_scale: tuple = (0.5, 1.5)
    hsv_prob: float = 0.5
    flip_prob: float = 0.5
    max_labels: int = 100
    # pixel compute dtype for the mosaic canvas + sampling: bf16 halves the
    # HBM traffic of the 3Hx3W canvas (pixel error <=1/255 — augmentation
    # noise); label math stays fp32
    pixel_dtype: str = "bfloat16"
    # mosaic sampling backend: "auto" uses the Pallas kernel on TPU when the
    # affine is separable and mosaic_scale fits its target-window bound;
    # "on"/"off" force it
    use_pallas: str = "auto"

    @classmethod
    def from_dict(cls, t: dict, max_labels: int = 100) -> "AugmentConfig":
        return cls(
            mosaic_prob=float(t.get("mosaic_prob", 0.9)),
            mosaic_scale=tuple(t.get("mosaic_scale", (0.1, 2.0))),
            degrees=float(t.get("degrees", 0.0)),
            translate=float(t.get("translate", 0.1)),
            shear=float(t.get("shear", 0.0)),
            perspective=float(t.get("perspective", 0.0)),
            mixup_prob=float(t.get("mixup_prob", 1.0)),
            mixup_scale=tuple(t.get("mixup_scale", (0.5, 1.5))),
            hsv_prob=float(t.get("hsv_prob", 0.5)),
            flip_prob=float(t.get("flip_prob", 0.5)),
            max_labels=max_labels,
            use_pallas=str(t.get("use_pallas", "auto")),
        )

    @property
    def separable(self) -> bool:
        """True when the affine has no rotation/shear/perspective, enabling
        the fast per-axis sampling path."""
        return (self.degrees == 0.0 and self.shear == 0.0
                and self.perspective == 0.0)


# ---------------------------------------------------------------- sampling

def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array,
                    fill: float = FILL) -> jax.Array:
    """General gather sampling: img [H,W,C] at float coords [h,w] each.
    Out-of-bounds -> fill. (Slow path: only used when rotation/shear on.)"""
    h, w = img.shape[:2]
    valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None].astype(img.dtype)
    fy = (y - y0)[..., None].astype(img.dtype)
    flat = img.reshape(h * w, -1)
    def g(yy, xx):
        return jnp.take(flat, (yy * w + xx).reshape(-1), axis=0).reshape(
            x.shape + (img.shape[-1],))
    out = (g(y0, x0) * (1 - fx) * (1 - fy) + g(y0, x1) * fx * (1 - fy)
           + g(y1, x0) * (1 - fx) * fy + g(y1, x1) * fx * fy)
    return jnp.where(valid[..., None], out, jnp.asarray(fill, img.dtype))


def separable_bilinear(img: jax.Array, xs: jax.Array, ys: jax.Array,
                       fill: float = FILL) -> jax.Array:
    """Separable sampling: img [H,W,C] at the coordinate grid ys[i] x xs[j].

    TPU strategy (measured at B64/640, bf16): the y-pass gathers whole rows
    (`jnp.take` axis 0 — contiguous, fast); the x-pass would be a strided
    per-column gather (slow), so it runs as an MXU matmul against the
    2-sparse interpolation matrix. The contraction is expressed as
    dot_general over the source-width axis with (Hout, C) flattened into the
    lhs rows — ONE [Hout*C, W] @ [W, Wout] matmul instead of Hout batched
    [Wout, W] @ [W, 3] matmuls whose N=3 wastes 125/128 MXU lanes.
    """
    h, w = img.shape[:2]
    c = img.shape[2]
    vy = (ys >= 0) & (ys <= h - 1)
    vx = (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    # keep lerp weights in the image dtype so bf16 canvases stay bf16
    fy = (ys - y0)[:, None].astype(img.dtype)
    # row gathers run on the [H, W*C] view: with C=3 minor the TPU gather
    # uses 3/128 lanes; flattening W and C puts the full row on the lanes
    flat = img.reshape(h, w * c)
    rows = (jnp.take(flat, y0, axis=0) * (1 - fy)
            + jnp.take(flat, y1, axis=0) * fy)         # [Hout, W*C]
    rows = rows.reshape(-1, w, c)

    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fx = (xs - x0).astype(img.dtype)
    iota = jnp.arange(w, dtype=jnp.int32)[None, :]
    sel = ((iota == x0[:, None]) * (1 - fx)[:, None]
           + (iota == x1[:, None]) * fx[:, None]).astype(img.dtype)  # [Wout, W]
    # out[h,w,k] = sum_c rows[h,c,k] * sel[w,c]
    out = jax.lax.dot_general(rows, sel, (((1,), (1,)), ((), ())),
                              preferred_element_type=img.dtype)  # [Hout,C,Wout]
    out = out.transpose(0, 2, 1)
    mask = vy[:, None] & vx[None, :]
    return jnp.where(mask[..., None], out, jnp.asarray(fill, img.dtype))


# ----------------------------------------------------------------- affines

def _affine_params(rng: jax.Array, cfg: AugmentConfig):
    """Random affine parameters (reference random_perspective sampling,
    mosaic_detection.py:269-358): rotation degrees, scale, shear, translate
    fractions. Returns (angle_rad, scale, shear_x, shear_y, tfrac_x, tfrac_y)."""
    k = jax.random.split(rng, 6)
    deg2rad = jnp.pi / 180.0
    ang = jax.random.uniform(k[0], (), minval=-cfg.degrees,
                             maxval=cfg.degrees) * deg2rad
    s = jax.random.uniform(k[1], (), minval=cfg.mosaic_scale[0],
                           maxval=cfg.mosaic_scale[1])
    shx = jnp.tan(jax.random.uniform(k[2], (), minval=-cfg.shear,
                                     maxval=cfg.shear) * deg2rad)
    shy = jnp.tan(jax.random.uniform(k[3], (), minval=-cfg.shear,
                                     maxval=cfg.shear) * deg2rad)
    tx = jax.random.uniform(k[4], (), minval=0.5 - cfg.translate,
                            maxval=0.5 + cfg.translate)
    ty = jax.random.uniform(k[5], (), minval=0.5 - cfg.translate,
                            maxval=0.5 + cfg.translate)
    return ang, s, shx, shy, tx, ty


def _affine_matrix(params, h: int, w: int, margin_y: float, margin_x: float):
    """3x3 forward matrix: margin-canvas coords -> output coords.
    Composition T @ Sh @ R(scale) @ C as in random_perspective, where C
    centers the (conceptual) 2w x 2h canvas; margins shift on top."""
    ang, s, shx, shy, tx, ty = params
    C = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    C = C.at[0, 2].set(-(w + margin_x)).at[1, 2].set(-(h + margin_y))
    cos, sin = jnp.cos(ang) * s, jnp.sin(ang) * s
    R = jnp.zeros((3, 3), jnp.float32).at[2, 2].set(1.0)
    R = R.at[0, 0].set(cos).at[0, 1].set(sin).at[1, 0].set(-sin).at[1, 1].set(cos)
    Sh = jnp.eye(3, dtype=jnp.float32).at[0, 1].set(shx).at[1, 0].set(shy)
    T = jnp.eye(3, dtype=jnp.float32).at[0, 2].set(tx * w).at[1, 2].set(ty * h)
    return T @ Sh @ R @ C


def _apply_affine_to_points(M: jax.Array, pts: jax.Array) -> jax.Array:
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    return (jnp.concatenate([pts, ones], axis=-1) @ M.T)[..., :2]


def _use_pallas_mosaic(cfg: AugmentConfig, h: int, w: int) -> bool:
    # the column-tap kernel has no mosaic_scale bound (taps are elementwise
    # per output row/column); "auto" = on TPU only; "interpret" runs the
    # Pallas path through the interpreter (CPU equivalence tests)
    if cfg.use_pallas == "off":
        return False
    if cfg.use_pallas in ("on", "interpret"):
        return True
    return jax.default_backend() == "tpu"


# ------------------------------------------------------------------ mosaic

def _crop_to_center(coord, lo, hi):
    # the reference's canvas is exactly 2h x 2w — tile overflow beyond it is
    # cropped (mosaic_detection.py:101-125). Our margins exist only to keep
    # dynamic_update_slice from clamp-shifting tiles, so sampling must treat
    # everything outside the central 2h x 2w window as fill.
    return jnp.where((coord >= lo) & (coord < hi), coord, -1e9)


def _mosaic_geometry(rng, labels4, h, w, cfg: AugmentConfig):
    """Random mosaic geometry + transformed labels for one image (separable
    path). Returns (oxw, oyw [4] int32 tile origins in 2Hx2W WINDOW coords,
    xs_raw [W], ys_raw [H] raw monotonic source coords in window space,
    cand [4M,5], valid [4M])."""
    mh, mw = h // 2, w // 2                      # canvas margins
    k_c, k_aff = jax.random.split(rng)
    # mosaic center on the 2x canvas (reference uniform(0.5s, 1.5s),
    # mosaic_detection.py:97-99), in margin-canvas coords (+margin)
    cx = jax.random.uniform(k_c, (), minval=0.5 * w, maxval=1.5 * w) + mw
    cy = jax.random.uniform(jax.random.fold_in(k_c, 1), (),
                            minval=0.5 * h, maxval=1.5 * h) + mh
    # tiles so their inner corners touch (cx, cy): TL, TR, BL, BR
    ox = jnp.stack([cx - w, cx, cx - w, cx]).astype(jnp.int32)
    oy = jnp.stack([cy - h, cy - h, cy, cy]).astype(jnp.int32)

    params = _affine_params(k_aff, cfg)
    M = _affine_matrix(params, h, w, mh, mw)
    # x_src(j) = (j - M02)/M00, y_src(i) = (i - M12)/M11, in window coords
    xs_raw = (jnp.arange(w, dtype=jnp.float32) - M[0, 2]) / M[0, 0] - mw
    ys_raw = (jnp.arange(h, dtype=jnp.float32) - M[1, 2]) / M[1, 1] - mh
    cand, valid = _mosaic_labels(M, labels4, ox, oy, h, w, mh, mw)
    return ox - mw, oy - mh, xs_raw, ys_raw, cand, valid


def _paste_window(imgs4, oxw, oyw):
    """Margin-canvas paste + central 2Hx2W window (jnp fallback path).
    The paste runs on the [H, W*3] flat view: with C=3 minor the DUS writes
    use 3/128 lanes; flat rows use all of them."""
    _, h, w, _ = imgs4.shape
    mh, mw = h // 2, w // 2
    ch, cw = 3 * h, 3 * w
    canvas = jnp.full((ch, cw * 3), FILL, imgs4.dtype)
    for k in range(4):
        canvas = jax.lax.dynamic_update_slice(
            canvas, imgs4[k].reshape(h, w * 3),
            (oyw[k] + mh, (oxw[k] + mw) * 3))
    canvas = canvas.reshape(ch, cw, 3)
    return canvas[mh:mh + 2 * h, mw:mw + 2 * w]


def _mosaic_one(rng, imgs4, labels4, cfg: AugmentConfig):
    """Fused mosaic+affine for one output image (general-affine path, used
    when rotation/shear/perspective are configured).

    imgs4: [4, H, W, 3] float32, labels4: [4, M, 5] (cls, cx, cy, w, h).
    Returns (out_img [H,W,3], cand_labels [4M, 5], cand_valid [4M]).
    """
    _, h, w, _ = imgs4.shape
    mh, mw = h // 2, w // 2                      # canvas margins
    ch, cw = 2 * h + 2 * mh, 2 * w + 2 * mw      # 3h x 3w margin canvas
    k_c, k_aff = jax.random.split(rng)
    cx = jax.random.uniform(k_c, (), minval=0.5 * w, maxval=1.5 * w) + mw
    cy = jax.random.uniform(jax.random.fold_in(k_c, 1), (),
                            minval=0.5 * h, maxval=1.5 * h) + mh
    ox = jnp.stack([cx - w, cx, cx - w, cx]).astype(jnp.int32)
    oy = jnp.stack([cy - h, cy - h, cy, cy]).astype(jnp.int32)
    canvas = jnp.full((ch, cw * 3), FILL, imgs4.dtype)
    for k in range(4):
        canvas = jax.lax.dynamic_update_slice(
            canvas, imgs4[k].reshape(h, w * 3), (oy[k], ox[k] * 3))
    canvas = canvas.reshape(ch, cw, 3)

    params = _affine_params(k_aff, cfg)
    M = _affine_matrix(params, h, w, mh, mw)

    window = canvas[mh:mh + 2 * h, mw:mw + 2 * w]
    if cfg.separable:
        xs = (jnp.arange(w, dtype=jnp.float32) - M[0, 2]) / M[0, 0]
        ys = (jnp.arange(h, dtype=jnp.float32) - M[1, 2]) / M[1, 1]
        xs = _crop_to_center(xs, mw, mw + 2 * w) - mw
        ys = _crop_to_center(ys, mh, mh + 2 * h) - mh
        out = separable_bilinear(window, xs, ys)
    else:
        Minv = jnp.linalg.inv(M)
        ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        cpts = _apply_affine_to_points(Minv, jnp.stack([jj, ii], axis=-1))
        out = bilinear_sample(
            window,
            _crop_to_center(cpts[..., 0], mw, mw + 2 * w) - mw,
            _crop_to_center(cpts[..., 1], mh, mh + 2 * h) - mh)

    cand, valid = _mosaic_labels(M, labels4, ox, oy, h, w, mh, mw)
    return out, cand, valid


def _mosaic_labels(M, labels4, ox, oy, h, w, mh, mw):
    # ---- labels: tile coords -> canvas (+offset) -> affine -> output
    area_scale = jnp.abs(M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0])
    cand, valid = [], []
    for k in range(4):
        lab = labels4[k]
        v = jnp.sum(jnp.abs(lab), axis=-1) > 0
        cxy = lab[:, 1:3] + jnp.stack([ox[k], oy[k]]).astype(lab.dtype)[None]
        wh = lab[:, 3:5]
        half = wh / 2
        corners = jnp.stack([
            cxy + jnp.stack([-half[:, 0], -half[:, 1]], -1),
            cxy + jnp.stack([half[:, 0], -half[:, 1]], -1),
            cxy + jnp.stack([-half[:, 0], half[:, 1]], -1),
            cxy + half,
        ], axis=1)                                   # [M, 4, 2] canvas coords
        # crop boxes to the 2h x 2w canvas window (margin content is fill)
        corners = jnp.clip(
            corners,
            jnp.asarray([mw, mh], jnp.float32),
            jnp.asarray([mw + 2 * w, mh + 2 * h], jnp.float32))
        tc = _apply_affine_to_points(M, corners)     # output coords
        x1 = jnp.clip(tc[..., 0].min(1), 0, w)
        y1 = jnp.clip(tc[..., 1].min(1), 0, h)
        x2 = jnp.clip(tc[..., 0].max(1), 0, w)
        y2 = jnp.clip(tc[..., 1].max(1), 0, h)
        nw, nh = x2 - x1, y2 - y1
        # box_candidates (mosaic_detection.py:361-373): wh > 2px, ar < 20,
        # clipped/warped area ratio > 0.2
        pre_area = jnp.maximum(wh[:, 0] * wh[:, 1], 1e-8) * area_scale
        ar = jnp.maximum(nw / jnp.maximum(nh, 1e-9), nh / jnp.maximum(nw, 1e-9))
        keep = v & (nw > 2) & (nh > 2) & (ar < 20) & (nw * nh / pre_area > 0.2)
        cand.append(jnp.stack([lab[:, 0], (x1 + x2) / 2, (y1 + y2) / 2, nw, nh], -1))
        valid.append(keep)
    return jnp.concatenate(cand, 0), jnp.concatenate(valid, 0)


def batched_separable(imgs: jax.Array, xs: jax.Array, ys: jax.Array,
                      fill: float = FILL) -> jax.Array:
    """Batched separable sampling: imgs [B,H,W,C] at per-image grids
    ys[b,i] x xs[b,j]. The row pass is ONE flat gather over [B*H, W*C]
    (a vmapped take lowers to a slow batched-gather); the x-pass is a
    batched MXU contraction against the 2-sparse interpolation matrices."""
    b, h, w, c = imgs.shape
    hout, wout = ys.shape[1], xs.shape[1]
    vy = (ys >= 0) & (ys <= h - 1)
    vx = (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fy = (ys - y0)[..., None].astype(imgs.dtype)
    flat = imgs.reshape(b * h, w * c)
    base = (jnp.arange(b, dtype=jnp.int32) * h)[:, None]
    r0 = jnp.take(flat, (base + y0).reshape(-1), axis=0)
    r1 = jnp.take(flat, (base + y1).reshape(-1), axis=0)
    rows = (r0.reshape(b, hout, w * c) * (1 - fy)
            + r1.reshape(b, hout, w * c) * fy)
    rows = rows.reshape(b, hout, w, c)

    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fx = (xs - x0).astype(imgs.dtype)
    iota = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    sel = ((iota == x0[..., None]) * (1 - fx)[..., None]
           + (iota == x1[..., None]) * fx[..., None]).astype(imgs.dtype)
    # out[b,i,j,k] = sum_c rows[b,i,c,k] * sel[b,j,c]
    out = jax.lax.dot_general(rows, sel, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=imgs.dtype)
    out = out.transpose(0, 1, 3, 2)                   # [B,Hout,Wout,C]
    mask = vy[:, :, None] & vx[:, None, :]
    return jnp.where(mask[..., None], out, jnp.asarray(fill, imgs.dtype))


def _compact_labels(cand: jax.Array, valid: jax.Array, max_labels: int):
    """Keep up to max_labels valid rows, zero-pad the rest (fixed shape)."""
    order = jnp.argsort(~valid, stable=True)
    cand = cand[order][:max_labels]
    valid = valid[order][:max_labels]
    return jnp.where(valid[:, None], cand, 0.0)


# --------------------------------------------------------------------- HSV

def _rgb_to_hsv(img, channel_axis=-1):
    """RGB [0,255] -> HSV with h,s in [0,1], v in [0,255]. channel_axis=0
    operates on channel-major (3, H, W) planes — full-lane TPU tiles.

    Kept for tests/reference; the hot path is the fused hsv_jitter below."""
    r = jnp.take(img, 0, axis=channel_axis)
    g = jnp.take(img, 1, axis=channel_axis)
    b = jnp.take(img, 2, axis=channel_axis)
    h, s, v = _rgb_to_hsv_planes(r, g, b)
    return jnp.stack([h, s, v / 255.0], axis=channel_axis)


def _rgb_to_hsv_planes(r, g, b):
    """Plane-wise RGB(0..255) -> (h [0,1), s [0,1], v [0,255])."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    rcp = 1.0 / jnp.maximum(delta, 1e-12)       # shared reciprocal: 1 div
    hr = ((g - b) * rcp) % 6.0
    hg = (b - r) * rcp + 2.0
    hb = (r - g) * rcp + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.where(delta > 0, h * (1.0 / 6.0), 0.0)
    s = delta / jnp.maximum(maxc, 1e-12)        # 0 when maxc == 0 (delta 0)
    return h, s, maxc


def _hsv_to_rgb_planes(h, s, v):
    """Branchless sector formula (identical to the classic i/p/q/t cases):
    f(n) = v * (1 - s * clip(min(k, 4 - k), 0, 1)), k = (n + 6h) mod 6;
    (r, g, b) = (f(5), f(3), f(1)). v in 0..255 passes straight through."""
    def chan(n):
        k = (n + h * 6.0) % 6.0
        t = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
        return v * (1.0 - s * t)
    return chan(5.0), chan(3.0), chan(1.0)


def _hsv_to_rgb(hsv, channel_axis=-1):
    """HSV (h,s in [0,1], v in [0,1]) -> RGB [0,255] (test/reference API)."""
    h = jnp.take(hsv, 0, axis=channel_axis)
    s = jnp.take(hsv, 1, axis=channel_axis)
    v = jnp.take(hsv, 2, axis=channel_axis)
    r, g, b = _hsv_to_rgb_planes(h, s, v * 255.0)
    return jnp.stack([r, g, b], axis=channel_axis)


def hsv_jitter(rng, img, hgain=0.015, sgain=0.7, vgain=0.4, enable=None,
               channel_axis=-1):
    """Random HSV gains (reference augment_hsv, data_augments.py:109-122).

    `enable` (bool scalar) gates by nulling the gains to identity, so the
    un-jittered branch is never computed twice (identity HSV roundtrip is
    exact up to float noise — cheaper than a where() over both branches).
    channel_axis=0 for channel-major (3, H, W) images (full-lane planes).

    Fused plane math: 2 divisions total, branchless sector reconstruction,
    value channel stays in the 0..255 domain (no /255 scaling passes) —
    the naive roundtrip measured 15.7 ms @B128/640 chw, this ~40% less."""
    gains = jax.random.uniform(rng, (3,), minval=-1.0, maxval=1.0)
    if enable is not None:
        gains = jnp.where(enable, gains, 0.0)
    dtype = img.dtype
    ca = channel_axis
    rc = jnp.take(img, 0, axis=ca).astype(jnp.float32)
    gc = jnp.take(img, 1, axis=ca).astype(jnp.float32)
    bc = jnp.take(img, 2, axis=ca).astype(jnp.float32)
    h, sat, v = _rgb_to_hsv_planes(rc, gc, bc)
    # multiplicative hue LUT `(x * r0) % 180` (data_augments.py:114-115),
    # mapped to our [0,1) hue space; gains=0 (gated) is an exact identity
    h = (h * (gains[0] * hgain + 1.0)) % 1.0
    sat = jnp.clip(sat * (gains[1] * sgain + 1.0), 0.0, 1.0)
    v = jnp.clip(v * (gains[2] * vgain + 1.0), 0.0, 255.0)
    r2, g2, b2 = _hsv_to_rgb_planes(h, sat, v)
    return jnp.stack([r2, g2, b2], axis=ca).astype(dtype)


# ------------------------------------------------------------------- mixup

def _mixup_geometry(rng, labels, cfg: AugmentConfig, h: int, w: int):
    """Mixup partner geometry + transformed labels (no pixels): sample
    coordinates (xs [W], ys [H]) for the jit-scale/flip/crop warp plus the
    matching label candidates. Split from the pixel sampling so the batch
    path can run all partners through one Pallas warp_sample call."""
    kf, kflip, ky, kx = jax.random.split(rng, 4)
    f = jax.random.uniform(kf, (), minval=cfg.mixup_scale[0],
                           maxval=cfg.mixup_scale[1])
    flip = jax.random.uniform(kflip, ()) > 0.5
    sh, sw = h * f, w * f
    y_off = jax.random.uniform(ky, ()) * jnp.maximum(sh - h, 0.0)
    x_off = jax.random.uniform(kx, ()) * jnp.maximum(sw - w, 0.0)
    xj = jnp.arange(w, dtype=jnp.float32) + x_off     # padded/scaled coords
    xj = jnp.where(flip, (sw - 1.0) - xj, xj)
    xs = (xj + 0.5) / f - 0.5                         # cv2-convention centers
    ys = (jnp.arange(h, dtype=jnp.float32) + y_off + 0.5) / f - 0.5

    v = jnp.sum(jnp.abs(labels), axis=-1) > 0
    cx, cy = labels[:, 1] * f, labels[:, 2] * f
    bw, bh = labels[:, 3] * f, labels[:, 4] * f
    x1, x2 = cx - bw / 2, cx + bw / 2
    fx1 = jnp.where(flip, sw - x2, x1)
    fx2 = jnp.where(flip, sw - x1, x2)
    x1n = jnp.clip(fx1 - x_off, 0.0, w)
    x2n = jnp.clip(fx2 - x_off, 0.0, w)
    y1n = jnp.clip(cy - bh / 2 - y_off, 0.0, h)
    y2n = jnp.clip(cy + bh / 2 - y_off, 0.0, h)
    nw, nh = x2n - x1n, y2n - y1n
    cand = jnp.stack(
        [labels[:, 0], (x1n + x2n) / 2, (y1n + y2n) / 2, nw, nh], -1)
    return xs, ys, cand, v & (nw > 1) & (nh > 1)


def _mixup_transform(rng, img, labels, cfg: AugmentConfig):
    """Reference mixup partner jitter (mosaic_detection.py:169-240): resize
    the letterboxed partner by jit_factor ~ U(*mixup_scale), 50% horizontal
    flip, zero-pad, random-crop back to (h, w); boxes are scaled, flipped
    about the scaled width, offset and clipped the same way.

    Runs device-side as one separable bilinear sample (the scale+crop is an
    axis-aligned affine). Deviations from the host reference: the crop offset
    is continuous-uniform rather than randint, and degenerate boxes (w or h
    <= 1px after clipping) are masked invalid — the reference feeds zero-area
    clipped boxes to its loss."""
    h, w = img.shape[:2]
    xs, ys, cand, v = _mixup_geometry(rng, labels, cfg, h, w)
    out = separable_bilinear(img, xs, ys, fill=0.0)   # pad canvas is zeros
    return out, cand, v


# -------------------------------------------------------------- multiscale

def multiscale_resize(images: jax.Array, labels: jax.Array,
                      out_hw: tuple[int, int]):
    """Device-side bilinear resize of an augmented batch to a bucket size,
    labels scaled along (multi-scale training, BASELINE config #5; the
    reference's analogue is the per-run input_dim + mosaic 2x canvas,
    mosaic_detection.py:101,127-136). `out_hw` is static — one compiled
    train step per bucket."""
    b, h, w = images.shape[:3]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return images, labels
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
    # in-range sampling: clamp instead of fill at the half-pixel edges
    xs = jnp.clip(xs, 0.0, w - 1)
    ys = jnp.clip(ys, 0.0, h - 1)
    out = jax.vmap(lambda im: separable_bilinear(im, xs, ys))(images)
    scale = jnp.asarray([1.0, ow / w, oh / h, ow / w, oh / h],
                        labels.dtype)
    return out, labels * scale[None, None, :]


# ------------------------------------------------------------------ driver

def _augment_one(rng, img, labels, partners, partner_labels, mix_img,
                 mix_labels, cfg: AugmentConfig, enable=True, mosaic=None,
                 mixup=None, chw=False):
    """Full augmentation for one sample. partners: [3,H,W,3] mosaic mates.
    `enable` (bool scalar, may be traced) gates mosaic+mixup — the YOLOX
    no-aug final epochs keep HSV/flip but drop the heavy augs.
    `mosaic`: optional precomputed (img, cand, valid) from the batched
    sampling path (separable affines); None computes it here (general
    affines). `mixup`: optional precomputed partner (img, cand, valid) from
    the batched Pallas warp path; None samples it here.
    `chw` (static): img and the precomputed pixel triples are channel-major
    (3, H, W) — the Pallas-path layout where channel planes are full TPU
    tiles (HSV/flip/blends at full lane utilization); label math is
    layout-independent."""
    h, w = img.shape[1:3] if chw else img.shape[:2]
    k_gate, k_mosaic, k_hsv, k_mixt = jax.random.split(rng, 4)
    gates = jax.random.uniform(k_gate, (4,))

    # components with prob == 0 are short-circuited STATICALLY — they never
    # enter the compiled program (jnp.where gating computes both branches)
    base_valid = jnp.sum(jnp.abs(labels), axis=-1) > 0
    if cfg.mosaic_prob > 0:
        if mosaic is not None:
            mo_img, mo_cand, mo_valid = mosaic
        else:
            imgs4 = jnp.concatenate([img[None], partners], axis=0)
            labels4 = jnp.concatenate([labels[None], partner_labels], axis=0)
            mo_img, mo_cand, mo_valid = _mosaic_one(k_mosaic, imgs4,
                                                    labels4, cfg)
        use_mosaic = (gates[0] < cfg.mosaic_prob) & enable
        out_img = jnp.where(use_mosaic, mo_img, img)
        m = labels.shape[0]
        pad = jnp.zeros((mo_cand.shape[0] - m, 5), labels.dtype)
        plain_cand = jnp.concatenate([labels, pad], axis=0)
        plain_valid = jnp.concatenate(
            [base_valid, jnp.zeros(mo_cand.shape[0] - m, bool)], axis=0)
        cand = jnp.where(use_mosaic, mo_cand, plain_cand)
        valid = jnp.where(use_mosaic, mo_valid, plain_valid)
    else:
        use_mosaic = jnp.asarray(False)
        out_img, cand, valid = img, labels, base_valid

    # mixup (reference mosaic_detection.py:140-141: only after mosaic):
    # jit-scale + flip + crop the partner, then 0.5/0.5 blend, labels
    # concatenated (mosaic_detection.py:169-240)
    if cfg.mixup_prob > 0 and cfg.mosaic_prob > 0:
        use_mix = use_mosaic & (gates[1] < cfg.mixup_prob)
        if mixup is not None:
            mix_t, mix_cand, mix_v = mixup
        else:
            mix_t, mix_cand, mix_v = _mixup_transform(k_mixt, mix_img,
                                                      mix_labels, cfg)
        out_img = jnp.where(use_mix, 0.5 * out_img + 0.5 * mix_t, out_img)
        cand = jnp.concatenate([cand, mix_cand], axis=0)
        valid = jnp.concatenate([valid, mix_v & use_mix], axis=0)

    # HSV (gain-gated: identity gains when the prob gate is off)
    if cfg.hsv_prob > 0:
        out_img = hsv_jitter(k_hsv, out_img, enable=gates[2] < cfg.hsv_prob,
                             channel_axis=0 if chw else -1)

    # horizontal flip (data_augments.py:125-129)
    if cfg.flip_prob > 0:
        do_flip = gates[3] < cfg.flip_prob
        flipped = out_img[..., ::-1] if chw else out_img[:, ::-1]
        out_img = jnp.where(do_flip, flipped, out_img)
        flipped_cx = jnp.where(valid, w - cand[:, 1], cand[:, 1])
        cand = jnp.where(do_flip, cand.at[:, 1].set(flipped_cx), cand)

    out_labels = _compact_labels(cand, valid, cfg.max_labels)
    return out_img, out_labels


def _chw_to_s2d(x: jax.Array) -> jax.Array:
    """[B,3,H,W] channel-major -> the Focus stem's space_to_depth layout
    [B,H/2,W/2,12], channel order q = px*2c + py*c + ch matching
    layers/blocks.py::space_to_depth (column-parity axis before row-parity).
    One relayout replaces the CHW->NHWC interleave + in-model s2d pair."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)     # (b, ch, i, py, j, px)
    x = x.transpose(0, 2, 4, 5, 3, 1)             # (b, i, j, px, py, ch)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def device_augment(rng: jax.Array, images: jax.Array, labels: jax.Array,
                   cfg: AugmentConfig, enable=True, out_s2d: bool = False):
    """Batched augmentation: images [B,H,W,3] (uint8 or float 0..255),
    labels [B,M,5] cxcywh-pixels. Returns (float32 images, [B,max_labels,5]).

    `enable` (bool, traced OK) gates mosaic+mixup at runtime so the trainer's
    no-aug final epochs reuse the SAME compiled step (HSV/flip stay on,
    matching the YOLOX no-aug recipe).

    `out_s2d` (static): emit the Focus stem's space_to_depth layout
    [B,H/2,W/2,12] in the pixel compute dtype instead of NHWC float32 —
    consumed by the model under layers/blocks.py::stem_input_s2d(). On the
    Pallas chw path this goes pool->s2d directly (no NHWC interleave, no
    bf16->f32->bf16 round-trip at the augment/model boundary, PERF.md
    "remaining nibbles"); values are bit-identical to the NHWC path
    (bf16->f32 widening is exact)."""
    b = images.shape[0]
    h, w = images.shape[1:3]
    pixel_dtype = jnp.bfloat16 if cfg.pixel_dtype == "bfloat16" else jnp.float32
    images = images.astype(pixel_dtype)
    enable = jnp.asarray(enable, bool)
    use_pal = _use_pallas_mosaic(cfg, h, w)
    k_perm, k_mix, k_each = jax.random.split(rng, 3)
    perm = jax.random.permutation(k_perm, b)
    idx4 = jnp.stack([jnp.roll(perm, -i) for i in (1, 2, 3)], axis=1)  # [B,3]
    partner_labels = labels[idx4]
    mix_idx = jax.random.permutation(k_mix, b)
    mix_labels = labels[mix_idx]
    keys = jax.random.split(k_each, b)

    # Pallas path: ALL pixel work runs channel-major (B, 3, H, W) — the
    # kernels fetch tile/partner pixels straight from one to_chw pool via
    # scalar-prefetch index maps (no [B,3,H,W,3] partner gather, no tile
    # concat — ~2.5 GB HBM traffic @B128/640), and HSV/flip/blends operate
    # on full-tile channel planes (the NHWC HSV roundtrip alone measured
    # 18.7 ms @B128 at 3/128 lane utilization). One NHWC transpose at the
    # end fuses with the f32 output cast. `interp` (use_pallas="interpret")
    # runs the same path via the interpreter for CPU equivalence tests.
    interp = cfg.use_pallas == "interpret"
    chw = use_pal and cfg.separable and cfg.mosaic_prob > 0
    need_partner_px = cfg.mosaic_prob > 0 and not chw
    need_mix_px = (cfg.mixup_prob > 0 and cfg.mosaic_prob > 0 and not chw)
    partners = (images[idx4] if need_partner_px
                else jnp.zeros((b, 1, 1, 1, 1), images.dtype))
    mix_img = (images[mix_idx] if need_mix_px
               else jnp.zeros((b, 1, 1, 1), images.dtype))
    pool = None
    if chw:
        from ..ops.pallas.mosaic_pallas import to_chw
        pool = to_chw(images)

    mosaic = None
    if cfg.mosaic_prob > 0 and cfg.separable:
        # geometry + labels per image (vmap), pixel sampling BATCHED — on
        # TPU through the Pallas kernel (gather-free; ops/pallas/
        # mosaic_pallas.py), else canvas + one flat take. Keys match
        # _augment_one's split so randomness is identical per path.
        def prep(key, lab, pl_):
            k_mosaic = jax.random.split(key, 4)[1]
            return _mosaic_geometry(
                k_mosaic, jnp.concatenate([lab[None], pl_], 0), h, w, cfg)

        oxw, oyw, xs_raw, ys_raw, mo_cand, mo_valid = jax.vmap(prep)(
            keys, labels, partner_labels)
        if chw:
            from ..ops.pallas.mosaic_pallas import mosaic_sample_idx
            tidx = jnp.concatenate(
                [jnp.arange(b, dtype=jnp.int32)[:, None],
                 idx4.astype(jnp.int32)], axis=1)
            mo_imgs = mosaic_sample_idx(pool, tidx, oxw, oyw,
                                        xs_raw, ys_raw, interpret=interp)
        else:
            tiles = jnp.concatenate([images[:, None], partners], axis=1)
            win = jax.vmap(_paste_window)(tiles, oxw, oyw)
            xs = jnp.where((xs_raw >= 0) & (xs_raw < 2 * w), xs_raw, -1e9)
            ys = jnp.where((ys_raw >= 0) & (ys_raw < 2 * h), ys_raw, -1e9)
            mo_imgs = batched_separable(win, xs, ys)
        mosaic = (mo_imgs, mo_cand, mo_valid)

    mixup = None
    if cfg.mixup_prob > 0 and cfg.mosaic_prob > 0 and chw:
        # batch the partner jit-scale/flip/crop through ONE Pallas warp
        # (the per-image take-based sampler measured ~11 ms of the 41 ms
        # augment step @ B64/640). Keys mirror _augment_one's split.
        def mixprep(key, ml):
            k_mixt = jax.random.split(key, 4)[3]
            return _mixup_geometry(k_mixt, ml, cfg, h, w)

        mxs, mys, mix_cand, mix_v = jax.vmap(mixprep)(keys, mix_labels)
        from ..ops.pallas.mosaic_pallas import warp_sample_idx
        mix_t = warp_sample_idx(pool, mix_idx, mxs, mys, fill=0.0,
                                interpret=interp)
        mixup = (mix_t, mix_cand, mix_v)

    n_mo = 0 if mosaic is None else 3
    fn = lambda k, i, l, p, pl, mi, ml, *extra: _augment_one(
        k, i, l, p, pl, mi, ml, cfg, enable=enable,
        mosaic=extra[:n_mo] if n_mo else None,
        mixup=extra[n_mo:] if len(extra) > n_mo else None, chw=chw)
    args = (keys, pool if chw else images, labels, partners, partner_labels,
            mix_img, mix_labels)
    extra = (tuple(mosaic) if mosaic is not None else ()) + (
        tuple(mixup) if mixup is not None else ())
    out_imgs, out_labels = jax.vmap(fn)(*args, *extra)
    if out_s2d:
        if chw:
            return _chw_to_s2d(out_imgs), out_labels
        from ..layers.blocks import space_to_depth
        return space_to_depth(out_imgs), out_labels
    if chw:
        from ..ops.pallas.mosaic_pallas import from_chw
        out_imgs = from_chw(out_imgs)
    return out_imgs.astype(jnp.float32), out_labels
