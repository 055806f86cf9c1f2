"""Resize-as-matmul parity against torch F.interpolate (the reference's
decoder/encoder resize semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.ops.resize import bilinear_resize


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (32, 32)),     # upscale (secret encoder path)
    ((64, 48), (32, 32)),     # downscale, non-square
    ((30, 30), (512 // 8, 512 // 8)),
    ((768, 768), (512, 512)),  # stage-3 decoder preprocess
])
def test_matches_torch_bilinear(in_hw, out_hw):
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), *out_hw))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=out_hw, mode="bilinear",
                        align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_identity():
    x = jnp.ones((1, 8, 8, 3))
    assert bilinear_resize(x, 8, 8) is x


def test_antialias_differs_on_downscale():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    a = np.asarray(bilinear_resize(x, 16, 16, antialias=False))
    b = np.asarray(bilinear_resize(x, 16, 16, antialias=True))
    assert np.abs(a - b).max() > 1e-3
