"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
tqdm + torchsummary; the TPU build adds jax.profiler traces + step timing).

Usage:
    with trace("/tmp/tb"):            # XLA trace viewable in TensorBoard
        step(...)

    timer = StepTimer()
    for batch in data:
        with timer:
            out = step(batch)
        print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (device + host timelines)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the TensorBoard timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summary; blocks on device."""

    def __init__(self, warmup: int = 1):
        self.times = []
        self.warmup = warmup
        self._t0: Optional[float] = None
        self._result = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def observe(self, result):
        """Register the step output so exit can block on it."""
        self._result = result
        return result

    def __exit__(self, *exc):
        if self._result is not None:
            jax.block_until_ready(self._result)
            self._result = None
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def steady(self):
        return self.times[self.warmup:] if len(self.times) > self.warmup \
            else self.times

    def summary(self) -> str:
        t = np.asarray(self.steady)
        if not len(t):
            return "no steps"
        return (f"steps={len(t)} mean={t.mean()*1e3:.1f}ms "
                f"p50={np.percentile(t,50)*1e3:.1f}ms "
                f"p95={np.percentile(t,95)*1e3:.1f}ms")


def device_memory_stats() -> dict:
    """Per-device HBM usage when the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use"),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use")}
        except Exception:
            out[str(d)] = None
    return out
