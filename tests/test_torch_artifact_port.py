"""Port of the reference's torch artifacts: build synthetic torch pickles
with the exact reference state-dict layouts, port them, and run the ported
models end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_reference_artifacts(d, bits=8):
    """Synthesize torch checkpoints in the reference's exact formats."""
    import torch
    import torch.nn as nn

    # SecretEncoder state dict layout (utils/models.py:57-64):
    # secret_scaler.{0: Linear, 5: Conv2d}
    enc = {
        "secret_scaler.0.weight": torch.randn(32 * 32, bits),
        "secret_scaler.0.bias": torch.randn(32 * 32),
        "secret_scaler.5.weight": torch.randn(4, 4, 3, 3) * 0.01,
        "secret_scaler.5.bias": torch.randn(4) * 0.01,
    }
    # mapper.pt layout (utils/models.py:103)
    mapper = {"bit_embeddings.weight": torch.randn(bits, 16)}
    torch.save(mapper, os.path.join(d, "mapper.pt"))
    return enc, mapper


def test_secret_encoder_port_matches_torch(tmp_path):
    import torch
    import torch.nn.functional as F

    from aqualora_tpu.models.watermark import SecretEncoder
    from aqualora_tpu.tools.torch_import import secret_encoder_from_torch

    bits = 8
    enc_state, _ = _make_reference_artifacts(str(tmp_path), bits)
    params = secret_encoder_from_torch(
        {k: v.numpy() for k, v in enc_state.items()})

    enc = SecretEncoder(bits, base_res=32, resolution=64)
    latent = np.random.RandomState(0).randn(2, 64, 64, 4).astype(np.float32)
    msg = np.random.RandomState(1).randint(0, 2, (2, bits)).astype(np.float32)
    wm, c = enc.apply({"params": params}, jnp.asarray(latent),
                      jnp.asarray(msg))

    # torch reference forward (models.py:70-81)
    with torch.no_grad():
        h = F.silu(torch.from_numpy(msg) @ enc_state["secret_scaler.0.weight"].T
                   + enc_state["secret_scaler.0.bias"])
        g = h.view(2, 1, 32, 32).repeat(1, 4, 1, 1)
        g = F.interpolate(g, scale_factor=2, mode="nearest")
        g = F.conv2d(g, enc_state["secret_scaler.5.weight"],
                     enc_state["secret_scaler.5.bias"], padding=1)
        ref_c = g.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(c), ref_c, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wm), latent + ref_c, atol=1e-4)


def test_mapper_port_matches_torch(tmp_path):
    import torch

    from aqualora_tpu.models.watermark import MapperNet
    from aqualora_tpu.tools.torch_import import mapper_from_torch

    bits = 8
    _, mapper_state = _make_reference_artifacts(str(tmp_path), bits)
    params = mapper_from_torch(os.path.join(str(tmp_path), "mapper.pt"))
    mapper = MapperNet(bits, 16)
    msg = np.random.RandomState(0).randint(0, 2, (3, bits)).astype(np.float32)
    out = mapper.apply({"params": params}, jnp.asarray(msg))
    emb = mapper_state["bit_embeddings.weight"].numpy()
    expect = (msg @ emb) / np.sqrt(bits) + 1.0
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_load_torch_pickle_accepts_full_dino_checkpoint(tmp_path):
    """The shipped dino_vitb16_pretrain.pth is a FULL training checkpoint
    (sd['student'] indexing in extractor.py:69-77) whose 'args' entry is
    an argparse.Namespace — the safe loader must allowlist it instead of
    crashing before key remapping."""
    import argparse

    import torch

    from aqualora_tpu.core.io import load_torch_pickle

    ck = {"student": {"module.backbone.w": torch.ones(3)},
          "args": argparse.Namespace(lr=0.1), "epoch": 7}
    p = tmp_path / "dino_full.pth"
    torch.save(ck, p)
    out = load_torch_pickle(str(p))
    np.testing.assert_array_equal(out["student"]["module.backbone.w"],
                                  np.ones(3, np.float32))
