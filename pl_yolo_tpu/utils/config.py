"""YAML config loading + CLI argument parser.

Capability parity with reference utils/defaults.py:6-29 — same flags, same
two-YAML (model + data) schema. Adds light schema validation (the reference
raises bare KeyErrors on missing keys, SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml


def load_config(path: str | Path) -> dict:
    """ASCII-safe YAML load (reference defaults.py:25-29)."""
    with open(path, "r", encoding="ascii", errors="ignore") as f:
        return yaml.safe_load(f)


REQUIRED_MODEL_KEYS = ("backbone", "neck", "head", "loss", "optimizer")
REQUIRED_DATA_KEYS = ("datamodule", "dataset", "transform", "num_classes", "classes")


def validate_model_config(cfg: dict, path: str = "<model cfg>") -> dict:
    missing = [k for k in REQUIRED_MODEL_KEYS if k not in cfg]
    if missing:
        raise ValueError(f"{path}: missing model-config sections: {missing}")
    return cfg


def validate_data_config(cfg: dict, path: str = "<data cfg>") -> dict:
    missing = [k for k in REQUIRED_DATA_KEYS if k not in cfg]
    if missing:
        raise ValueError(f"{path}: missing data-config sections: {missing}")
    if len(cfg["classes"]) != cfg["num_classes"]:
        raise ValueError(
            f"{path}: num_classes={cfg['num_classes']} but {len(cfg['classes'])} class names")
    return cfg


def train_argument_parser() -> argparse.ArgumentParser:
    """CLI flags (reference utils/defaults.py:6-22)."""
    p = argparse.ArgumentParser("pl_yolo_tpu train/test")
    p.add_argument("-n", "--experiment_name", type=str, default=None)
    p.add_argument("-c", "--model_config", type=str, required=True,
                   help="path to the model yaml")
    p.add_argument("-d", "--dataset_config", type=str, required=True,
                   help="path to the data yaml")
    p.add_argument("-l", "--logger", type=str, default="tb",
                   help="logger backend: csv | tb | wandb | neptune")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint to load weights from")
    p.add_argument("--resume", action="store_true",
                   help="resume training (opt state + step) from --ckpt "
                        "[works here, unlike the reference: train.py:52-54]")
    p.add_argument("--test", action="store_true", help="run test/eval only")
    p.add_argument("--visualize", action="store_true",
                   help="dump detection visualizations during test")
    p.add_argument("--nms", type=float, default=0.65, help="test NMS IoU threshold")
    p.add_argument("--conf", type=float, default=0.01, help="test confidence threshold")
    p.add_argument("--show_dir", type=str, default="./show",
                   help="directory for visualization dumps")
    p.add_argument("--show_score_thr", type=float, default=0.3,
                   help="min score for drawn boxes")
    p.add_argument("--data_path", type=str, default=None,
                   help="override dataset.dir from the data yaml")
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override the 300-epoch default")
    p.add_argument("--output_dir", type=str, default="./runs")
    p.add_argument("--seed", type=int, default=96)
    p.add_argument("--sanitize", action="store_true",
                   help="log device-side grad norm + non-finite grad counts "
                        "each epoch (in-step sanitizer)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax debug_nans (the TPU equivalent of the "
                        "reference's commented-out detect_anomaly, "
                        "train.py:46): jit re-runs op-by-op on NaN and "
                        "points at the producing primitive")
    return p
