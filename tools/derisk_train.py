"""Learning de-risk run (VERDICT r1 weak #9): train on a few-hundred-image
synthetic shape-detection dataset with a DISJOINT val split and report mAP —
evidence the loss/aug/eval stack generalizes beyond the 8-image overfit.

Three classes distinguished by shape (circle / rectangle / triangle) with
random colors, sizes, counts and textured backgrounds, so the task needs
real localization + classification, not color lookup.

Run: python tools/derisk_train.py [epochs [size]]   (real TPU, ~10 min)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image, ImageDraw  # noqa: E402

CLASSES = ["circle", "rectangle", "triangle"]


def make_split(root, n_images, size, seed):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/annotations", exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n_images):
        # textured background: vertical gradient + noise
        base = rng.integers(30, 120, 3)
        grad = np.linspace(0.6, 1.4, size)[:, None, None]
        bg = np.clip(base[None, None] * grad
                     + rng.normal(0, 12, (size, size, 3)), 0, 255)
        img = Image.fromarray(bg.astype(np.uint8))
        draw = ImageDraw.Draw(img)
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, 3))
            s = int(rng.integers(int(0.15 * size), int(0.4 * size)))
            x = int(rng.integers(0, size - s))
            y = int(rng.integers(0, size - s))
            color = tuple(int(c) for c in rng.integers(90, 255, 3))
            if cls == 0:
                draw.ellipse([x, y, x + s, y + s], fill=color)
            elif cls == 1:
                draw.rectangle([x, y, x + s, y + s], fill=color)
            else:
                draw.polygon([(x + s // 2, y), (x, y + s), (x + s, y + s)],
                             fill=color)
            anns.append({"id": aid, "image_id": i + 1,
                         "category_id": cls + 1,
                         "bbox": [x, y, s, s], "area": s * s, "iscrowd": 0,
                         "segmentation": []})
            aid += 1
        fname = f"img_{i:04d}.jpg"
        img.save(f"{root}/images/{fname}", quality=92)
        images.append({"id": i + 1, "file_name": fname,
                       "height": size, "width": size})
    doc = {"images": images, "annotations": anns,
           "categories": [{"id": c + 1, "name": n}
                          for c, n in enumerate(CLASSES)]}
    with open(f"{root}/annotations/instances.json", "w") as f:
        json.dump(doc, f)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 192

    root = "/tmp/derisk_data"
    train_root, val_root = f"{root}/train", f"{root}/val"
    make_split(train_root, 320, size, seed=11)
    make_split(val_root, 64, size, seed=999)  # disjoint split
    # val images live in a different dir: merge into one dataset layout
    model_cfg = {
        "name": "derisk_nano",
        "dtype": "bfloat16",
        "backbone": {"name": "cspdarknet", "depths": [1, 2, 2, 1],
                     "channels": [16, 32, 64, 128, 256],
                     "outputs": ["stage2", "stage3", "stage4"],
                     "norm": "bn", "act": "silu"},
        "neck": {"name": "csppafpn", "depths": [1, 1, 1, 1],
                 "channels": [64, 128, 256], "norm": "bn", "act": "silu"},
        "head": {"name": "decoupled_head", "num_anchor": 1,
                 "channels": [64, 128, 256], "norm": "bn", "act": "silu"},
        "loss": {"name": "yolox", "stride": [8, 16, 32]},
        "optimizer": {"name": "SGD", "learning_rate": 0.02, "momentum": 0.9,
                      "weight_decay": 0.0005, "warmup": 0.1, "ema": True},
        "schedule": {"no_aug_epochs": max(epochs // 6, 1), "use_l1": True},
    }
    data_cfg = {
        "name": "derisk", "datamodule": "coco",
        "dataset": {
            "dir": train_root, "train": "images",
            "train_json": "annotations/instances.json",
            "val": f"{val_root}/images",
            "val_json": f"{val_root}/annotations/instances.json",
            "test": f"{val_root}/images",
            "test_json": f"{val_root}/annotations/instances.json",
            "train_size": [size, size], "val_size": [size, size],
            "train_batch_size": 32, "val_batch_size": 32,
        },
        "transform": {
            "hsv_prob": 0.5, "flip_prob": 0.5, "mosaic_prob": 0.7,
            "mosaic_scale": [0.5, 1.5], "degrees": 0, "translate": 0.1,
            "shear": 0, "mixup_prob": 0.3, "mixup_scale": [0.7, 1.3],
            "copypaste_prob": 0, "cutpaste_prob": 0, "cutoutR_prob": 0,
        },
        "num_classes": 3, "classes": CLASSES,
    }

    from pl_yolo_tpu.train.trainer import Trainer

    trainer = Trainer(model_cfg, data_cfg, max_epochs=epochs,
                      check_val_every_n_epoch=max(epochs // 6, 1),
                      output_dir="/tmp/derisk_runs", logger="csv",
                      cache_images=True)
    trainer.fit()
    print(json.dumps({
        "derisk": "synthetic-shapes 320 train / 64 disjoint val",
        "epochs": epochs, "size": size,
        "best_mAP": round(trainer.best_map, 4),
        "best_mAP50": round(trainer.best_map50, 4),
    }))


if __name__ == "__main__":
    main()
