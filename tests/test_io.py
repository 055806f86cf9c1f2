"""Interop tests: key layouts, safetensors round-trips, torch conversion."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.core import io
from aqualora_tpu.core.config import PipelineConfig, UNetConfig
from aqualora_tpu.models.unet import UNet2DConditionModel

REF_KEYS = "/root/reference/utils/unet_keys.json"
CFG = PipelineConfig.tiny()
KEY = jax.random.PRNGKey(0)


@pytest.mark.skipif(not os.path.exists(REF_KEYS), reason="no reference")
def test_unet_module_keys_match_reference_exactly():
    """Our enumeration must equal utils/unet_keys.json (all 192, in order)."""
    ref = json.load(open(REF_KEYS))
    ours = io.unet_module_keys(UNetConfig.sd15())
    assert ours == ref


@pytest.fixture(scope="module")
def unet_params():
    unet = UNet2DConditionModel(CFG.unet)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, CFG.unet.cross_attention_dim))
    p = unet.init(KEY, x, jnp.zeros((1,)), ctx,
                  jnp.ones((1, CFG.unet.lora.rank)))
    return p["params"]


def test_lora_export_import_roundtrip(unet_params, tmp_path):
    import flax.traverse_util as tu
    # randomize lora weights so the roundtrip is meaningful
    flat = tu.flatten_dict(unet_params)
    for k in flat:
        if "lora" in k:
            flat[k] = jax.random.normal(jax.random.PRNGKey(len(str(k))),
                                        flat[k].shape)
    params = tu.unflatten_dict(flat)

    state = io.export_lora_safetensors(params, CFG.unet,
                                       str(tmp_path / "lora.safetensors"))
    n_sites = len(io.unet_module_keys(CFG.unet))
    assert len(state) == 2 * n_sites
    assert all(k.startswith("unet.") and k.endswith(".weight") for k in state)
    # attn sites use the .processor.to_*_lora layout (ppft_train.py:458-468)
    assert any(".processor.to_q_lora.down.weight" in k for k in state)
    assert any(".proj_in.lora.down.weight" in k for k in state)

    loaded = io.load_safetensors(str(tmp_path / "lora.safetensors"))
    zeroed = tu.unflatten_dict({k: (np.zeros_like(v) if "lora" in k else v)
                                for k, v in flat.items()})
    restored = io.import_lora_safetensors(zeroed, CFG.unet, loaded)
    rflat = tu.flatten_dict(restored)
    for k in flat:
        if "lora" in k:
            np.testing.assert_allclose(rflat[k], flat[k], atol=1e-6)


def test_torch_state_roundtrip_clip():
    """flax -> torch-layout -> flax must be the identity."""
    from aqualora_tpu.models.clip import CLIPTextModel
    clip = CLIPTextModel(CFG.clip)
    p = clip.init(KEY, jnp.zeros((1, 77), jnp.int32))["params"]
    torch_state = io.flax_params_to_torch_state(p)
    assert any(k.startswith("layers.0.self_attn.q_proj.weight")
               for k in torch_state)
    back = io.torch_state_to_flax_params(torch_state)
    restored = io.assign_into(p, back)
    import flax.traverse_util as tu
    f0, f1 = tu.flatten_dict(p), tu.flatten_dict(restored)
    for k in f0:
        np.testing.assert_allclose(f0[k], f1[k], atol=0)


def test_torch_import_transposes():
    """A torch conv weight (O,I,H,W) must land as flax (H,W,I,O)."""
    w = np.arange(2 * 3 * 5 * 7, dtype=np.float32).reshape(2, 3, 5, 7)
    tree = io.torch_state_to_flax_params({"conv_in.weight": w})
    assert tree["conv_in"]["kernel"].shape == (5, 7, 3, 2)
    lin = np.arange(6, dtype=np.float32).reshape(2, 3)
    tree = io.torch_state_to_flax_params({"to_q.weight": lin})
    assert tree["to_q"]["kernel"].shape == (3, 2)
