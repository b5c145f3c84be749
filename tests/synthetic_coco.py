"""Synthetic on-disk COCO/VOC datasets for integration tests
(SURVEY.md §4: '1-step train on synthetic COCO, json generated in-test')."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw


def make_coco(root: Path, num_images: int = 4, num_classes: int = 3,
              size=(120, 160), seed: int = 0) -> Path:
    """Create images/ + annotations/instances.json under root; boxes are
    drawn rectangles so detection is learnable. Returns root."""
    rng = np.random.default_rng(seed)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    h, w = size
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img = Image.new("RGB", (w, h), (40, 90, 40))
        draw = ImageDraw.Draw(img)
        n_obj = int(rng.integers(1, 4))
        for _ in range(n_obj):
            bw = int(rng.integers(20, w // 2))
            bh = int(rng.integers(20, h // 2))
            x = int(rng.integers(0, w - bw))
            y = int(rng.integers(0, h - bh))
            cls = int(rng.integers(0, num_classes))
            color = [(220, 40, 40), (40, 40, 220), (220, 220, 40)][cls % 3]
            draw.rectangle([x, y, x + bw, y + bh], fill=tuple(color))
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cls + 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                "segmentation": [],
            })
            ann_id += 1
        fname = f"img_{i:04d}.jpg"
        img.save(root / "images" / fname, quality=95)
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
    doc = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"class{c}"} for c in range(num_classes)],
    }
    with open(root / "annotations" / "instances.json", "w") as f:
        json.dump(doc, f)
    return root


def make_voc(root: Path, num_images: int = 3, size=(100, 140), seed: int = 1) -> Path:
    """Create a minimal VOC layout: JPEGImages/, Annotations/, ImageSets/Main/."""
    rng = np.random.default_rng(seed)
    (root / "JPEGImages").mkdir(parents=True, exist_ok=True)
    (root / "Annotations").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets/Main").mkdir(parents=True, exist_ok=True)
    h, w = size
    names = ["dog", "cat", "person"]
    stems = []
    for i in range(num_images):
        stem = f"im{i:03d}"
        stems.append(stem)
        img = Image.new("RGB", (w, h), (60, 60, 60))
        draw = ImageDraw.Draw(img)
        x, y = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
        bw, bh = int(rng.integers(20, w // 2)), int(rng.integers(20, h // 2))
        draw.rectangle([x, y, x + bw, y + bh], fill=(200, 30, 30))
        img.save(root / "JPEGImages" / f"{stem}.jpg")
        name = names[i % len(names)]
        xml = f"""<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <object>
    <name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>{x + 1}</xmin><ymin>{y + 1}</ymin><xmax>{x + bw + 1}</xmax><ymax>{y + bh + 1}</ymax></bndbox>
  </object>
</annotation>"""
        (root / "Annotations" / f"{stem}.xml").write_text(xml)
    (root / "ImageSets/Main/train.txt").write_text("\n".join(stems) + "\n")
    return root
