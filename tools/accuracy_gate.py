#!/usr/bin/env python
"""Automated accuracy-regression gate (VERDICT r3 #3).

One command trains deterministic-seed YOLOX-tiny on a deterministic
hard-shapes set (tools/make_shapes_dataset.py --hard) at 160² for a few
minutes on-chip and ASSERTS the held-out COCO mAP clears a recorded floor —
so a subtle assigner/augment/loss regression fails loudly instead of
surviving until someone re-runs the 120-epoch README benchmark by hand.
This automates the reference's only validation signal
(/root/reference/PL_Modules/pl_detection.py:82-96, mAP every 5 epochs)
as a regression-proof gate.

Calibration (2026-08-19, v5e-class dev chip, this exact recipe):
100 epochs reach held-out mAP 0.337 / mAP50 0.544 in ~18.5 min (40 epochs
give only 0.046 — warmup-dominated, too weak to gate on; see
GATE_RESULTS.jsonl for per-round entries). The floor is set with margin
below the calibrated point to absorb run-to-run nondeterminism
(data-order and augmentation RNG are seeded, but XLA reductions are not
bit-deterministic across recompiles); a real assigner/augment regression
costs far more than the margin (the r2 'ij'-grid bug was worth ~20 mAP
points on this set).

The gate is family-parametric (--model yolox_tiny|yolov7_tiny|yolov5_s);
the anchor-based families run a 200-epoch recipe by default (they converge
~2x slower than SimOTA here — measured curves in DEFAULT_FLOORS' comment)
with --autoanchor recommended at this 160-px size.

Usage: python tools/accuracy_gate.py [--model M] [--epochs N] [--floor F]
Exit code 0 = PASS (mAP >= floor), 1 = FAIL. Appends a JSON line to
GATE_RESULTS.jsonl either way.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Per-model (floor, default epochs) = on-chip calibration
# (GATE_RESULTS.jsonl) minus margin. The anchor-based family converges
# ~2x slower than SimOTA on this benchmark but reaches comparable
# accuracy — the 2026-08-20 convergence curves (--autoanchor, ultralytics
# balance): yolov7_tiny 0.046@50ep -> 0.113@100 -> 0.131@150 -> 0.141@200;
# yolov5_s 0.119@50 -> 0.218@100 -> 0.260@150 -> 0.290@200 (vs yolox_tiny
# 0.337@100). So the anchor gates run 200 epochs by default; the loss math
# is certified value+grad-identical to the reference torch implementations
# by tests/test_loss_parity_ref.py.
#   yolox_tiny : mAP 0.337 @100 epochs (2026-08-19, r4) -> floor 0.25
#   yolov7_tiny: mAP 0.141 @200 epochs -> floor 0.10
#   yolov5_s   : mAP 0.290 @200 epochs -> floor 0.22
DEFAULT_FLOORS = {"yolox_tiny": (0.25, 100), "yolov7_tiny": (0.10, 200),
                  "yolov5_s": (0.22, 200)}
GATE_SIZE = 160
GATE_SEED = 10


def ensure_dataset(root: pathlib.Path) -> None:
    marker = root / "annotations" / "instances_val.json"
    if marker.exists():
        return
    from make_shapes_dataset import make_split  # tools/ sibling

    make_split(root, "train", 400, GATE_SIZE, GATE_SEED, hard=True)
    make_split(root, "val", 100, GATE_SIZE, GATE_SEED + 1, hard=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="default = the model's calibrated recipe length "
                         "(100 for yolox_tiny, 200 for the slower-"
                         "converging anchor family)")
    ap.add_argument("--model", default="yolox_tiny",
                    choices=sorted(DEFAULT_FLOORS),
                    help="which family to gate (yolov7_tiny gates the "
                         "anchor-based OTA loss path)")
    ap.add_argument("--floor", type=float, default=None,
                    help="override the calibrated floor (0.0 = calibration "
                         "run)")
    ap.add_argument("--balance", choices=["reference", "ultralytics"],
                    default=None,
                    help="yolov7 per-level obj balance order: 'reference' "
                         "(0.4,1,4 — 4.0 on stride-32, yolov7_loss.py:26) "
                         "or 'ultralytics' (4,1,0.4 — 4.0 on stride-8, "
                         "where small objects live); default = config")
    ap.add_argument("--scale-gains", action="store_true",
                    help="anchor-based models: A/B the upstream "
                         "ultralytics train-time loss-gain scaling "
                         "(obj *= (size/640)^2, cls *= nc/80). MEASURED "
                         "NEGATIVE at this gate: yolov7_tiny 0.0685 -> "
                         "0.0021 mAP (2026-08-20) — the 1/16 obj weight "
                         "leaves the confidence signal untrained at 100 "
                         "epochs; kept as an experiment flag only")
    ap.add_argument("--autoanchor", action="store_true",
                    help="k-means the anchor priors from the gate set's GT "
                         "boxes (anchor-based models only): the shipped "
                         "COCO-640 table leaves most levels unmatchable at "
                         "160 px (utils/autoanchor.py)")
    ap.add_argument("--root", default=os.path.expanduser(
        "~/.cache/pl_yolo_tpu_gate/shapes_hard_160"))
    ap.add_argument("--out", default="/tmp/accuracy_gate_run")
    args = ap.parse_args()
    floor, default_epochs = DEFAULT_FLOORS[args.model]
    if args.epochs is None:
        args.epochs = default_epochs
    if args.floor is None:
        env = os.environ.get("GATE_FLOOR")
        args.floor = float(env) if env is not None else floor

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    ensure_dataset(pathlib.Path(args.root))

    from pl_yolo_tpu.utils.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pl_yolo_tpu.utils.config import (load_config, validate_data_config,
                                          validate_model_config)

    repo = pathlib.Path(__file__).resolve().parent.parent
    model_cfg = validate_model_config(
        load_config(repo / f"pl_yolo_tpu/configs/model/{args.model}.yaml"),
        f"{args.model}.yaml")
    # scale the upstream 300-epoch recipe's 15 no-aug epochs to the gate
    model_cfg.setdefault("schedule", {})
    model_cfg["schedule"]["no_aug_epochs"] = max(4, args.epochs // 5)

    if args.balance:
        if model_cfg["loss"]["name"] != "yolov7":
            ap.error("--balance applies to the yolov7 loss")
        model_cfg["loss"]["balance"] = (
            [0.4, 1.0, 4.0] if args.balance == "reference"
            else [4.0, 1.0, 0.4])

    if args.scale_gains:
        if "anchors" not in model_cfg.get("loss", {}):
            ap.error(f"--scale-gains: {args.model} is anchor-free")
        nc = 6  # shapes_hard classes; cls = 0.5*nc/80 is already the default
        gain = {"obj": (GATE_SIZE / 640.0) ** 2,
                "cls": 0.5 * nc / 80.0}
        model_cfg["loss"]["gain"] = gain
        print(f"scale-gains: {gain}")

    if args.autoanchor:
        if "anchors" not in model_cfg.get("loss", {}):
            ap.error(f"--autoanchor: {args.model} is anchor-free")
        from pl_yolo_tpu.utils.autoanchor import dataset_anchors
        anchors = dataset_anchors(
            str(pathlib.Path(args.root) / "annotations/instances_train.json"),
            n_levels=len(model_cfg["loss"]["anchors"]),
            per_level=len(model_cfg["loss"]["anchors"][0]),
            img_size=(GATE_SIZE, GATE_SIZE))
        model_cfg["loss"]["anchors"] = [list(map(list, lvl))
                                        for lvl in anchors]
        print(f"autoanchor: {anchors}")

    data_cfg = validate_data_config(
        load_config(repo / "pl_yolo_tpu/configs/data/shapes_hard.yaml"),
        "shapes_hard.yaml")
    data_cfg["dataset"]["dir"] = args.root
    data_cfg["dataset"]["train_size"] = [GATE_SIZE, GATE_SIZE]
    data_cfg["dataset"]["val_size"] = [GATE_SIZE, GATE_SIZE]

    from pl_yolo_tpu.train.trainer import Trainer

    t0 = time.time()
    trainer = Trainer(model_cfg, data_cfg, max_epochs=args.epochs,
                      check_val_every_n_epoch=max(5, args.epochs // 4),
                      output_dir=args.out,
                      experiment_name=f"gate_{args.model}",
                      logger="csv", seed=96)
    trainer.fit()
    wall = time.time() - t0

    result = {
        "ts": time.time(), "model": args.model,
        "epochs": args.epochs, "size": GATE_SIZE,
        "mAP": round(trainer.best_map, 4),
        "mAP50": round(trainer.best_map50, 4),
        "floor": args.floor, "wall_s": round(wall, 1),
        "pass": trainer.best_map >= args.floor,
    }
    if args.autoanchor:
        result["autoanchor"] = True
    if args.scale_gains:
        result["scale_gains"] = True
    if args.balance:
        result["balance"] = args.balance
    with open(repo / "GATE_RESULTS.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    verdict = "PASS" if result["pass"] else "FAIL"
    print(f"accuracy_gate: {verdict} — held-out mAP {result['mAP']:.3f} "
          f"(mAP50 {result['mAP50']:.3f}) vs floor {args.floor:.2f} "
          f"in {wall:.0f}s / {args.epochs} epochs")
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
