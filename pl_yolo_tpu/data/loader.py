"""Batch loaders: infinite sharded training stream + sequential eval stream.

Capability parity with the reference DataLoader wiring
(PL_DataModules/coco.py:85-116: 6 workers, pin_memory, YoloBatchSampler) and
the rank/world-size-aware InfiniteSampler (models/data/samplers.py:42-86,
unused there, first-class here), re-designed for the TPU input path:

  * The train stream is an infinite, epoch-seeded, per-host-sharded index
    sequence. Each host loads only its shard (multi-host DCN data
    parallelism, SURVEY.md §2.6 item 2).
  * Batches are plain numpy (uint8 images + padded labels); ALL augmentation
    beyond letterboxing runs on device (pl_yolo_tpu/data/augment.py), so the
    host loop is decode+resize only.
  * A background thread keeps a small prefetch queue so host decode overlaps
    device compute (the reference leans on torch DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class InfiniteSampler:
    """Infinite shuffled index stream, sharded across hosts
    (reference samplers.py:42-86 semantics)."""

    def __init__(self, size: int, shard_id: int = 0, num_shards: int = 1,
                 seed: int = 96, shuffle: bool = True):
        assert size > 0
        self.size = size
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.seed = seed
        self.shuffle = shuffle

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            rng = np.random.default_rng(self.seed + epoch)
            order = rng.permutation(self.size) if self.shuffle else np.arange(self.size)
            yield from order[self.shard_id::self.num_shards].tolist()
            epoch += 1


def _collate(samples):
    imgs = np.stack([s[0] for s in samples])
    labels = np.stack([s[1] for s in samples])
    hs = np.asarray([s[2][0] for s in samples], np.int32)
    ws = np.asarray([s[2][1] for s in samples], np.int32)
    ids = np.asarray([s[3] for s in samples], np.int64)
    return {"images": imgs, "labels": labels, "img_h": hs, "img_w": ws,
            "img_id": ids}


class TrainLoader:
    """Infinite prefetching batch iterator over a DetectionDataset."""

    def __init__(self, dataset, batch_size: int, shard_id: int = 0,
                 num_shards: int = 1, seed: int = 96, prefetch: int = 2,
                 host_augment=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.host_augment = host_augment  # optional (img, labels) -> same
        self.sampler = InfiniteSampler(len(dataset), shard_id, num_shards, seed)
        self.steps_per_epoch = max(
            len(dataset) // (batch_size * num_shards), 1)
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        batch = []
        for idx in self.sampler:
            if self._stop.is_set():
                return
            sample = self.dataset[idx]
            if self.host_augment is not None:
                img, labels = self.host_augment(sample[0], sample[1])
                sample = (img, labels, *sample[2:])
            batch.append(sample)
            if len(batch) == self.batch_size:
                out = _collate(batch)
                batch = []
                while not self._stop.is_set():
                    try:
                        self._queue.put(out, timeout=0.5)
                        break
                    except queue.Full:
                        continue

    def __iter__(self):
        return self

    def __next__(self):
        return self._queue.get()

    def close(self):
        self._stop.set()


def eval_batches(dataset, batch_size: int, shard_id: int = 0,
                 num_shards: int = 1):
    """Sequential eval iterator; the last batch is padded by repeating the
    final sample (fixed shapes for jit) with a `count` marking real rows.
    With num_shards > 1 each host walks a strided subset (detections are
    gathered for evaluation, parallel/distributed.py)."""
    all_idxs = list(range(shard_id, len(dataset), num_shards))
    n = len(all_idxs)
    for start in range(0, n, batch_size):
        idxs = all_idxs[start:start + batch_size]
        count = len(idxs)
        idxs = list(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        batch = _collate([dataset[i] for i in idxs])
        batch["count"] = count
        yield batch
