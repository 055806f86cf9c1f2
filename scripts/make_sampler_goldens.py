"""Regenerate tests/goldens/sampler_goldens.npz (the committed sampler
numerics pin, tests/test_samplers.py::test_golden_vectors_self_consistency).

Run ONLY after an intended sampler-numerics change, then commit the npz
together with the change that motivated it.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tests.test_samplers import GOLDEN_PATH, compute_golden_outputs  # noqa: E402

if __name__ == "__main__":
    out = compute_golden_outputs()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez(GOLDEN_PATH, **out)
    print(f"wrote {len(out)} golden vectors to {GOLDEN_PATH}")
