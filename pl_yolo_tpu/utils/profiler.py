"""Profiling / tracing utilities.

Capability parity with the reference's ad-hoc instrumentation (manual
wall-clock timing pl_detection.py:72-77,102-104; thop FLOPs utils/flops.py;
torch.profiler example tools/torch2trt_example.py:40-71) — TPU-native:
jax.profiler device traces (viewable in TensorBoard / Perfetto), a step
timer that respects async dispatch, and XLA cost analysis (utils/flops.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./profile"):
    """Capture a device trace: `with trace('dir'): run_steps()` then load the
    dir in TensorBoard's profile tab or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with an explicit sync on a result leaf —
    required because dispatch is async (and block_until_ready can ack early
    through remote tunnels; a scalar readback is the reliable fence)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(jax.numpy.sum(sync_value))  # fence
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        xs = self.times[1:] if len(self.times) > 1 else self.times  # drop compile
        return sum(xs) / max(len(xs), 1)


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
