"""Profiling utilities (SURVEY §5 tracing hooks)."""

import jax
import jax.numpy as jnp

from aqualora_tpu.utils.profiling import StepTimer, annotate, device_memory_stats


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            t.observe(jnp.ones((8, 8)) * 2)
    s = t.summary()
    assert "steps=2" in s and "p50=" in s


def test_annotate_and_memory_stats():
    with annotate("test-region"):
        _ = jnp.ones(4) + 1
    stats = device_memory_stats()
    assert len(stats) >= 1
