"""Profiling & observability — new functionality over the reference (which has
only tqdm bars, SURVEY.md §5): jax.profiler traces viewable in
Perfetto/TensorBoard, and a lightweight step-time/throughput tracker.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace for the enclosed steps:
    with profile_trace(workdir + '/profile'): run_steps()"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling images/sec + step-time tracker."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def step(self, n_items: int = 1):
        now = time.perf_counter()
        if self._t is not None:
            self._times.append((now - self._t, n_items))
            if len(self._times) > self.window:
                self._times.pop(0)
        self._t = now

    @property
    def items_per_sec(self) -> Optional[float]:
        if not self._times:
            return None
        total_t = sum(t for t, _ in self._times)
        total_n = sum(n for _, n in self._times)
        return total_n / total_t if total_t > 0 else None

    @property
    def sec_per_step(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(t for t, _ in self._times) / len(self._times)
