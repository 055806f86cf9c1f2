"""bench.py's mesh-aware path: under the conftest's 8 virtual CPU
devices the CPU-fallback batch of 2 auto-shards over a 2-device data
mesh — the same code path a real multi-chip v5e host takes."""

import importlib.util
import json
import os

import jax
import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_probe_backend_semantics(monkeypatch):
    """The tunnel watchdog: skip-flag trusts the env; a subprocess that
    never returns (wedged axon relay) reads as NOT ok; a completed
    discovery reads as ok."""
    import subprocess as sp

    bench = _load_bench()
    monkeypatch.setenv("AQUALORA_BENCH_PROBE", "0")
    assert bench._probe_backend() is True
    monkeypatch.setenv("AQUALORA_BENCH_PROBE", "1")

    def timed_out(*a, **kw):
        raise sp.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", timed_out)
    assert bench._probe_backend(timeout_s=1) is False

    class Done:
        returncode = 0
        stdout = "cpu\n"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **kw: Done())
    assert bench._probe_backend() is True


@pytest.mark.slow
def test_bench_main_shards_over_data_mesh(capsys, monkeypatch):
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    # skip the tunnel-discovery subprocess probe: on the dev machine it
    # would hang against the (possibly wedged) axon tunnel for its full
    # timeout; jax is already forced to CPU by conftest here
    monkeypatch.setenv("AQUALORA_BENCH_PROBE", "0")
    bench = _load_bench()
    bench.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    result = json.loads(line)
    assert result["devices"] == 2          # gcd(batch=2, 8 devices)
    assert result["value"] > 0
    assert result["total_imgs_per_sec"] == pytest.approx(
        result["value"] * 2, rel=1e-6)
