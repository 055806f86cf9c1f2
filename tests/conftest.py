"""Test harness: force an 8-device virtual CPU mesh.

The real chip is a single TPU behind a tunnel (slow per-test compiles and
no multi-chip); all unit tests run on CPU with 8 virtual devices so the
data-parallel/sharding paths are exercised without TPU hardware — the
strategy SURVEY.md §4(c) prescribes.  NOTE: the axon TPU plugin ignores
the JAX_PLATFORMS env var, so the backend is pinned via jax.config.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
