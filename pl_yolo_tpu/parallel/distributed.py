"""Multi-host (DCN) utilities: process init, per-host data sharding, and the
cross-replica eval gather.

Capability parity targets (SURVEY.md §2.6 'TPU-native equivalents'):
  2. Multi-host data parallel — `initialize()` wraps
     jax.distributed.initialize; each host feeds its own shard through the
     per-host InfiniteSampler (data/loader.py) using (process_index,
     process_count) — the working version of the reference's unused
     rank/world_size hooks (models/data/samplers.py:62-66).
  3. Cross-replica eval gather — detections computed on each host's shard
     are gathered to every host for COCO/VOC evaluation (the reference
     accumulates in-process, pl_detection.py:82-93).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize multi-host JAX if configured; returns
    (process_index, process_count). Safe to call single-host (no-op)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def shard_info() -> tuple[int, int]:
    """(shard_id, num_shards) for per-host data loading."""
    return jax.process_index(), jax.process_count()


def all_gather_host(values) -> list:
    """Gather a pytree of per-host numpy/python data to ALL hosts (for eval
    aggregation). Single-process: identity list. Multi-process: rides a tiny
    jit'd all_gather over the 'processes' axis of a global mesh.

    Detections are small host-side lists; serialization via fixed-size
    uint8 buffers keeps this a pure-XLA collective (no extra deps)."""
    if jax.process_count() == 1:
        return [values]
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(values), dtype=np.uint8)
    # 1) agree on a common buffer size, 2) gather padded payloads + lengths
    lengths = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64))
    max_len = int(np.max(lengths))
    padded = np.zeros(max_len, np.uint8)
    padded[:len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(bytes(gathered[i][:int(lengths[i][0])]))
            for i in range(jax.process_count())]


def is_main_process() -> bool:
    return jax.process_index() == 0
