"""Test config: force CPU with 8 virtual devices so sharding/collective tests
run without a TPU slice (SURVEY.md §4 'Distributed')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).parent))  # for oracles.py

import jax  # noqa: E402

# The env var alone is not enough under the 'axon' TPU plugin, which wins
# platform selection; the config update forces CPU deterministically.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: test-suite wall time on this 1-core host is
# dominated by recompiles of unchanged tiny models across pytest processes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pl_yolo_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(96)
