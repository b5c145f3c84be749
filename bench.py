"""Benchmark: YOLOX-s images/sec/chip at 640x640 (train step + infer w/ NMS).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The driver metric (BASELINE.json) is images/sec/chip for YOLOX-s train +
infer incl. NMS on COCO-shaped data. The reference publishes no numbers
(BASELINE.md), so vs_baseline divides by a DERIVED A100 figure whose chain
is documented in BASELINE.md ("A100 train-throughput denominator"): the
ultralytics-published YOLOv5-s 300-epoch/2-day V100 time (~205 img/s),
FLOPs-scaled to YOLOX-s (26.8 vs 17.1 GFLOPs, YOLOX paper Table 2) and
A100:V100 ~2x => ~262, rounded to 250. `vs_baseline_conservative` divides
by 400 (top of the plausible band) so the claim does not hinge on the
favourable end. North-star target: >= 2x A100 on one TPU chip.

Besides the pure device-step rate, the bench measures the END-TO-END rate:
real 640x640 JPEGs (a persistent synthetic COCO-layout set) flowing through
COCODataset -> the pre-letterboxed uint8 disk cache -> TrainLoader ->
device_prefetch -> the same train step. `e2e_images_per_sec` in the JSON is
that number; `BENCH_E2E=0` skips it (`BENCH_E2E_IMAGES`, `BENCH_WORKERS`
tune it). The one-time JPEG + disk-cache build persists under
~/.cache/pl_yolo_tpu_bench.
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

A100_TRAIN_IPS_ESTIMATE = 250.0      # img/s/chip, derivation in BASELINE.md
A100_TRAIN_IPS_CONSERVATIVE = 400.0  # top of the plausible band (BASELINE.md)

# Throughput sweet spot on v5e (16 GB HBM): 64 -> 350.7, 96 -> 391.5,
# 128 -> 429.2, 192 -> 370.5 img/s (HBM pressure beyond 128).
BATCH = int(os.environ.get("BENCH_BATCH", 128))
SIZE = int(os.environ.get("BENCH_SIZE", 640))
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", 10))
E2E = os.environ.get("BENCH_E2E", "1") != "0"
E2E_IMAGES = int(os.environ.get("BENCH_E2E_IMAGES", 512))
E2E_ITERS = int(os.environ.get("BENCH_E2E_ITERS", 12))
E2E_WORKERS = int(os.environ.get("BENCH_WORKERS", 0))  # 1-core host default
BENCH_CACHE = os.path.expanduser("~/.cache/pl_yolo_tpu_bench")


def _ensure_bench_jpegs(n: int, size: int) -> str:
    """Persistent synthetic COCO-layout JPEG set: textured backgrounds +
    8 colored boxes per image, realistic decode cost. Returns the root."""
    import json as _json
    import pathlib

    root = pathlib.Path(BENCH_CACHE) / f"jpegs_{n}_{size}"
    marker = root / "annotations" / "instances.json"
    if marker.exists():
        try:
            if len(_json.load(open(marker))["images"]) == n:
                return str(root)
        except Exception:
            pass
    from PIL import Image

    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(96)
    # textured base (shared ramps + per-image noise) keeps JPEGs honestly
    # sized (~100-200 KB) without burning minutes on synthesis
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    ramps = np.stack([
        120 + 60 * np.sin(2 * np.pi * 3 * xx / size),
        120 + 60 * np.sin(2 * np.pi * 2 * yy / size),
        120 + 50 * np.sin(2 * np.pi * (xx + yy) / size),
    ], -1)
    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        img = ramps + rng.normal(0, 18, (size, size, 3))
        boxes = []
        for _ in range(8):
            lo = min(40, max(size // 8, 2))
            bw, bh = rng.integers(lo, max(size // 2, lo + 1), 2)
            x, y = rng.integers(0, size - bw), rng.integers(0, size - bh)
            cls = int(rng.integers(0, 80))
            img[y:y + bh, x:x + bw] = rng.uniform(0, 255, 3)
            boxes.append((int(x), int(y), int(bw), int(bh), cls))
        arr = np.clip(img, 0, 255).astype(np.uint8)
        fname = f"b{i:05d}.jpg"
        Image.fromarray(arr).save(root / "images" / fname, quality=85)
        images.append({"id": i + 1, "file_name": fname,
                       "height": size, "width": size})
        for (x, y, bw, bh, cls) in boxes:
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cls + 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
    doc = {"images": images, "annotations": annotations,
           "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(80)]}
    with open(marker, "w") as f:
        _json.dump(doc, f)
    return str(root)


def main():
    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()  # swept defaults (+1.3%); user LIBTPU_INIT_ARGS wins

    import jax

    # persistent compile cache (works through the axon remote-compile path:
    # measured 5.7 s -> 0.8 s across fresh processes) — keeps the cold
    # driver invocation from paying the multi-minute 640^2 compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pl_yolo_tpu.data.augment import AugmentConfig, device_augment
    from pl_yolo_tpu.models.detector import build_model
    from pl_yolo_tpu.ops.nms import postprocess
    from pl_yolo_tpu.train.optim import build_optimizer
    from pl_yolo_tpu.train.state import TrainState, make_train_step
    from pl_yolo_tpu.utils.config import load_config
    import pathlib

    cfg = load_config(pathlib.Path(__file__).parent
                      / "pl_yolo_tpu/configs/model/yolox_s.yaml")
    model = build_model(cfg, num_classes=80)
    variables = model.init(jax.random.key(0), input_size=(SIZE, SIZE))
    tx, _ = build_optimizer(cfg["optimizer"], total_steps=1000)
    state = TrainState.create(variables, tx)

    aug_cfg = AugmentConfig(max_labels=100)
    # Train through the production path: Focus-stem backbones are fed the
    # augment's direct space-to-depth layout (trainer.py wires the same) —
    # identical math, one less relayout at the augment/model boundary.
    from pl_yolo_tpu.layers.blocks import stem_input_s2d

    raw_apply = model.module.apply

    def s2d_apply(variables, images, train, **kw):
        with stem_input_s2d():
            return raw_apply(variables, images, train, **kw)

    step = make_train_step(
        s2d_apply, model.loss.train_loss,
        augment_fn=lambda r, i, l: device_augment(r, i, l, aug_cfg,
                                                  out_s2d=True))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (BATCH, SIZE, SIZE, 3)),
                         jnp.float32)
    labels = np.zeros((BATCH, 50, 5), np.float32)
    labels[:, :8, 0] = rng.integers(0, 80, (BATCH, 8))
    labels[:, :8, 1:] = rng.uniform(50, 550, (BATCH, 8, 4))
    labels = jnp.asarray(labels)

    # ---- train step
    # NOTE: under the remote-tunnel backend block_until_ready can ack before
    # device execution finishes; a scalar host readback is the reliable sync.
    for i in range(WARMUP):
        state, losses = step(state, images, labels, jax.random.key(i))
    _ = float(losses["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, losses = step(state, images, labels, jax.random.key(100 + i))
    _ = float(losses["loss"])  # forces the chained steps to complete
    train_ips = BATCH * ITERS / (time.perf_counter() - t0)

    # ---- end-to-end: real JPEGs -> disk cache -> loader -> same train step
    #
    # Context for reading the numbers (diagnosed r3): through the remote
    # 'axon' tunnel the host->device link sustains only ~45-70 MB/s — a
    # 157 MB uint8 B128 640^2 batch takes >2 s to ship, capping e2e at
    # ~40-55 img/s NO MATTER how fast the host assembles batches (the
    # loader itself sustains >1100 img/s, measured below). A standard TPU
    # host feeds over local PCIe DMA at multi-GB/s, where the device step
    # becomes the binding constraint. So the honest efficiency metric here
    # is e2e vs the MEASURED transfer bound, reported alongside e2e vs the
    # device step rate.
    e2e_ips = loader_ips = link_mbps = loader_sweep = None
    if E2E:
        from pl_yolo_tpu.data.datasets import COCODataset
        from pl_yolo_tpu.data.loader import TrainLoader, device_prefetch

        root = _ensure_bench_jpegs(E2E_IMAGES, SIZE)
        ds = COCODataset(root, "annotations/instances.json", "images",
                         img_size=(SIZE, SIZE), max_labels=50)
        ds.attach_disk_cache(os.path.join(root, "diskcache"))
        loader = TrainLoader(ds, BATCH, num_workers=E2E_WORKERS)
        # uint8 end-to-end: the device-side augment consumes uint8 directly,
        # so the host->device transfer is 1 byte/px (4x less than f32)
        batches = device_prefetch(
            loader, lambda b: (jnp.asarray(b["images"]),
                               jnp.asarray(b["labels"])), threaded=True)
        for i in range(2):  # compile (uint8 signature) + warm
            imgs, labs = next(batches)
            state, losses = step(state, imgs, labs, jax.random.key(200 + i))
        _ = float(losses["loss"])
        t0 = time.perf_counter()
        for i in range(E2E_ITERS):
            imgs, labs = next(batches)
            state, losses = step(state, imgs, labs, jax.random.key(300 + i))
        _ = float(losses["loss"])
        e2e_ips = BATCH * E2E_ITERS / (time.perf_counter() - t0)

        loader.close()

        # host-only batch assembly rate (disk cache -> collated numpy).
        # Warm 3 batches first (page cache, worker spin-up) and time >= 20
        # (the old 4-batch read mixed cold page-cache into the figure), per
        # worker count: 0 (in-thread) / 2 / 4 subprocess workers. On this
        # 1-core host extra workers mostly measure scheduling overhead; on
        # a real multi-core PCIe host they scale the decode (PERF.md "feed
        # budget" has the cores-per-chip arithmetic).
        def _loader_rate(workers: int, warm: int = 3, iters: int = 20):
            ld = TrainLoader(ds, BATCH, num_workers=workers)
            try:
                for _ in range(warm):
                    next(ld)
                t0 = time.perf_counter()
                for _ in range(iters):
                    next(ld)
                return BATCH * iters / (time.perf_counter() - t0)
            finally:
                ld.close()

        loader_sweep = {str(w): round(_loader_rate(w), 1)
                        for w in (0, 2, 4)}
        loader_ips = loader_sweep[str(E2E_WORKERS)] if str(E2E_WORKERS) \
            in loader_sweep else _loader_rate(E2E_WORKERS)

        # host->device link bandwidth, fenced by per-array scalar readback
        # (block_until_ready acks EARLY through the tunnel — do not trust it)
        probe = np.zeros((BATCH, SIZE, SIZE, 3), np.uint8)
        fence = jax.jit(lambda a: jnp.sum(a[0, 0, 0].astype(jnp.float32)))
        _ = float(fence(jnp.asarray(probe)))  # warm
        t0 = time.perf_counter()
        sent = [jnp.asarray(probe) for _ in range(3)]
        for s_arr in sent:
            _ = float(fence(s_arr))
        dt = time.perf_counter() - t0
        link_mbps = 3 * probe.nbytes / 2**20 / dt

    # ---- inference + NMS
    eval_vars = state.eval_variables

    @jax.jit
    def infer(v, x):
        preds = model.loss.eval_decode(model.module.apply(v, x, False))
        return postprocess(preds, conf_threshold=0.01, iou_threshold=0.65)

    for _ in range(WARMUP):
        det = infer(eval_vars, images)
    _ = float(jnp.sum(det.scores))
    # independent calls: the device executes programs in order, so reading
    # back the last result bounds the whole loop's wall time
    t0 = time.perf_counter()
    for _ in range(ITERS):
        det = infer(eval_vars, images)
    _ = float(jnp.sum(det.scores))
    infer_ips = BATCH * ITERS / (time.perf_counter() - t0)

    n_chips = 1  # bench runs single-chip
    value = train_ips / n_chips
    print(json.dumps({
        "metric": "yolox_s_640_train_images_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / A100_TRAIN_IPS_ESTIMATE, 3),
        "vs_baseline_conservative": round(value / A100_TRAIN_IPS_CONSERVATIVE, 3),
        "infer_nms_images_per_sec_per_chip": round(infer_ips / n_chips, 2),
        "e2e_images_per_sec": (round(e2e_ips, 2) if e2e_ips else None),
        "e2e_frac_of_device": (round(e2e_ips / train_ips, 3) if e2e_ips
                               else None),
        "host_loader_images_per_sec": (round(loader_ips, 1) if loader_ips
                                       else None),
        "host_loader_sweep_by_workers": loader_sweep,
        "h2d_link_MBps": (round(link_mbps, 1) if link_mbps else None),
        # e2e vs what the measured host->device link can physically carry —
        # ~1.0 means the input path saturates the link (see comment above)
        "e2e_frac_of_link_bound": (
            round(e2e_ips / (link_mbps * 2**20 / (SIZE * SIZE * 3)), 3)
            if e2e_ips and link_mbps else None),
        "batch": BATCH,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
