#!/usr/bin/env python
"""Prepare COCO 2017 for the 300-epoch mAP-parity run (VERDICT r2 #8).

Gets a mounted/downloaded COCO 2017 into the exact layout
configs/data/coco2017.yaml expects, verifies it, and (optionally)
pre-builds the pre-letterboxed uint8 disk cache so the first training
epoch starts at full speed. Mirrors what the reference assumes implicitly
(PL_DataModules/coco.py expects dir/train2017+annotations); here it is an
explicit, checked step.

Usage:
    # archives already downloaded (zero-egress envs: rsync/mount them)
    python tools/prepare_coco.py --root /data/COCO2017 \
        --archives /path/with/{train2017.zip,val2017.zip,annotations_trainval2017.zip}

    # layout already extracted -> just verify (+ optionally build the cache)
    python tools/prepare_coco.py --root /data/COCO2017 --build-cache

Then launch the full run with tools/launch_coco300.sh.
"""

from __future__ import annotations

import argparse
import json
import sys
import zipfile
from pathlib import Path

EXPECT = {
    "train2017": 118287,
    "val2017": 5000,
}
ANN = ("annotations/instances_train2017.json",
       "annotations/instances_val2017.json")


def extract(root: Path, archives: Path) -> None:
    for name in ("train2017.zip", "val2017.zip",
                 "annotations_trainval2017.zip"):
        src = archives / name
        if not src.exists():
            sys.exit(f"missing archive: {src}")
        print(f"[prepare_coco] extracting {src} -> {root}")
        with zipfile.ZipFile(src) as z:
            z.extractall(root)


def verify(root: Path) -> None:
    ok = True
    for sub, n in EXPECT.items():
        d = root / sub
        count = sum(1 for _ in d.glob("*.jpg")) if d.is_dir() else 0
        status = "ok" if count == n else f"EXPECTED {n}"
        ok &= count == n
        print(f"[prepare_coco] {sub}: {count} jpgs ({status})")
    for ann in ANN:
        p = root / ann
        if not p.exists():
            print(f"[prepare_coco] MISSING {p}")
            ok = False
            continue
        with open(p) as f:
            doc = json.load(f)
        print(f"[prepare_coco] {ann}: {len(doc['images'])} images, "
              f"{len(doc['annotations'])} anns, "
              f"{len(doc['categories'])} categories")
        ok &= len(doc["categories"]) == 80
    if not ok:
        sys.exit("[prepare_coco] verification FAILED — fix the layout above")
    print("[prepare_coco] layout verified")


def build_cache(root: Path, size: int) -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from pl_yolo_tpu.data.datasets import COCODataset

    for split, json_rel in (("train2017", ANN[0]), ("val2017", ANN[1])):
        ds = COCODataset(str(root), json_rel, split,
                         img_size=(size, size), max_labels=100)
        sub = "train" if split == "train2017" else "val"
        ds.attach_disk_cache(str(root / "diskcache" / sub), workers=8)
        print(f"[prepare_coco] disk cache ready: {split} ({len(ds)} images)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="target dataset dir (configs/data/coco2017.yaml "
                         "`dataset.dir`)")
    ap.add_argument("--archives",
                    help="dir holding the three official COCO zips; omit if "
                         "already extracted")
    ap.add_argument("--build-cache", action="store_true",
                    help="pre-build the uint8 disk cache (decode once now "
                         "instead of during epoch 0)")
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    if args.archives:
        extract(root, Path(args.archives))
    verify(root)
    if args.build_cache:
        build_cache(root, args.size)
    print("[prepare_coco] done — launch with tools/launch_coco300.sh")


if __name__ == "__main__":
    main()
