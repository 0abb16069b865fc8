"""Profiling hooks (the reference has none — SURVEY §5: only wall-clock
prints). TPU-native equivalents:

  * trace(...)  — context manager around jax.profiler.trace, producing
    a TensorBoard-loadable trace of XLA execution;
  * StepTimer   — wall-clock per-step timing with device sync, for
    imgs/sec accounting without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator:
    """Profile everything inside the context into log_dir."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times jitted steps: stop(result) blocks until `result` is ready.
    Pass the PREVIOUS step's output to start(sync_on=...) to exclude
    still-in-flight device work from the measurement."""

    def __init__(self):
        self.durations = []
        self._t = None

    def start(self, sync_on=None) -> None:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._t = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t
        self.durations.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.durations) / max(len(self.durations), 1)

    def imgs_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean if self.durations else 0.0
