"""Driver-path guard: the dryrun_multichip entry (8-device CPU mesh,
data x model sharding, full PPFT step) must keep compiling and running —
this is exactly what the graft driver executes."""

import jax
import pytest


def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest sets them)")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    import __graft_entry__ as g
    g.dryrun_multichip(2)
