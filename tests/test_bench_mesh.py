"""bench.py's mesh-aware path: under the conftest's 8 virtual CPU
devices the CPU-fallback batch of 2 auto-shards over a 2-device data
mesh — the same code path a real multi-chip v5e host takes."""

import importlib.util
import json
import os

import jax
import pytest


@pytest.mark.slow
def test_bench_main_shards_over_data_mesh(capsys):
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    result = json.loads(line)
    assert result["devices"] == 2          # gcd(batch=2, 8 devices)
    assert result["value"] > 0
    assert result["total_imgs_per_sec"] == pytest.approx(
        result["value"] * 2, rel=1e-6)
