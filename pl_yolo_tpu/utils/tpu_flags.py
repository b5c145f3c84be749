"""Tuned libtpu/XLA flag defaults for the training hot loop.

tools/xla_sweep.py swept single-chip-relevant XLA TPU flags over the
B128 640^2 YOLOX-s train step (sweep_results.jsonl); the winning config —
64 MB scoped-VMEM scratch for the fusion cost model plus the
latency-hiding scheduler — re-validated in an interleaved A/B at 30
iters: baseline 511.05/511.12 vs tuned 520.15/515.22 img/s (~+1.3%,
consistent ordering across both pairs).

`apply_tuned_flags()` installs that config via LIBTPU_INIT_ARGS unless
the user already set it (their choice wins) or opts out with
PLYOLO_NO_TUNED_FLAGS=1. Must run before the first JAX backend-client
creation — libtpu reads the variable once at initialisation. Harmless on
CPU/GPU backends (libtpu never loads).
"""

from __future__ import annotations

import os

TUNED_LIBTPU_ARGS = (
    "--xla_tpu_scoped_vmem_limit_kib=65536 "
    "--xla_tpu_enable_latency_hiding_scheduler=true"
)


def apply_tuned_flags() -> bool:
    """Set tuned LIBTPU_INIT_ARGS defaults; returns True if applied."""
    if os.environ.get("PLYOLO_NO_TUNED_FLAGS") == "1":
        return False
    if "LIBTPU_INIT_ARGS" in os.environ:
        return False
    os.environ["LIBTPU_INIT_ARGS"] = TUNED_LIBTPU_ARGS
    return True
