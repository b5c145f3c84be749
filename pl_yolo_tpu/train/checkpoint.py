"""Checkpointing: top-k-by-mAP retention + working resume (Orbax).

Capability parity with reference ModelCheckpoint(save_top_k=2, monitor='mAP',
mode=max) (train.py:24-29) — and fixes two reference gaps (SURVEY.md §5):
EMA weights are checkpointed (the reference keeps them only in memory,
pl_detection.py:35,48) and --resume actually restores step/opt state (the
reference parses but ignores it, train.py:52-54).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 2,
                 monitor: str = "mAP"):
        self.directory = Path(directory).absolute()
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda metrics: float(metrics.get(monitor, 0.0)),
            best_mode="max",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state_tree: Any, metrics: dict | None = None):
        """state_tree: plain pytree (e.g. {'params':..., 'ema_params':...,
        'opt_state':..., 'step':...})."""
        self._mgr.save(
            int(step),
            args=ocp.args.StandardSave(state_tree),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def best_step(self):
        return self._mgr.best_step()

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, abstract_tree: Any = None):
        step = step if step is not None else self.latest_step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if abstract_tree is not None:
            abstract_tree = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                         abstract_tree)
            return self._mgr.restore(
                int(step), args=ocp.args.StandardRestore(abstract_tree))
        return self._mgr.restore(int(step))

    def close(self):
        self._mgr.close()
