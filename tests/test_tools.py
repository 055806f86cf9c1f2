"""LoRA toolchain tests: create_wm_lora folding math + layout converters."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.core import io
from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.models.unet import UNet2DConditionModel
from aqualora_tpu.tools.create_wm_lora import (create_watermark_lora,
                                               mapper_diag_from_state)
from aqualora_tpu.tools.lora_layouts import diffusers_to_webui, webui_to_diffusers

CFG = PipelineConfig.tiny()
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def train_folder(tmp_path_factory):
    """A fake trained artifact folder: random LoRA + mapper."""
    import flax.traverse_util as tu
    d = tmp_path_factory.mktemp("train_folder")
    unet = UNet2DConditionModel(CFG.unet)
    p = unet.init(KEY, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                  jnp.zeros((1, 77, CFG.unet.cross_attention_dim)),
                  jnp.ones((1, CFG.unet.lora.rank)))["params"]
    flat = tu.flatten_dict(p)
    for k in flat:
        if "lora" in k:
            flat[k] = jax.random.normal(jax.random.PRNGKey(len(str(k))),
                                        flat[k].shape)
    io.export_lora_safetensors(tu.unflatten_dict(flat), CFG.unet,
                               str(d / "pytorch_lora_weights.safetensors"))
    emb = np.random.RandomState(0).randn(
        CFG.watermark.msg_bits, CFG.watermark.lora_rank).astype(np.float32)
    io.save_safetensors({"bit_embeddings.weight": emb},
                        str(d / "mapper.safetensors"))
    return str(d)


def test_create_wm_lora_folding_math(train_folder):
    """down' = diag(mapper) @ down * scale for linear; up unchanged
    (scripts/create_wm_lora.py:26-37)."""
    bitstring, folded = create_watermark_lora(train_folder, scale=1.03,
                                              msg_bits=CFG.watermark.msg_bits,
                                              save=False,
                                              rng=np.random.default_rng(3))
    assert len(bitstring) == CFG.watermark.msg_bits
    orig = io.load_safetensors(
        os.path.join(train_folder, "pytorch_lora_weights.safetensors"))
    mapper_state = io.load_safetensors(
        os.path.join(train_folder, "mapper.safetensors"))
    bits = np.array([int(c) for c in bitstring])
    mapped = mapper_diag_from_state(mapper_state, bits)[0]

    lin_down = next(k for k in orig if "to_q_lora.down.weight" in k)
    np.testing.assert_allclose(folded[lin_down],
                               mapped[:, None] * orig[lin_down] * 1.03,
                               rtol=1e-5)
    lin_up = lin_down.replace("down.weight", "up.weight")
    np.testing.assert_allclose(folded[lin_up], orig[lin_up])
    conv_down = next(k for k in orig if "proj_in.lora.down.weight" in k)
    np.testing.assert_allclose(
        folded[conv_down],
        orig[conv_down] * mapped[:, None, None, None] * 1.03, rtol=1e-5)


def test_folded_lora_equals_diag_scale_forward(train_folder):
    """Folding the message into the weights (create_wm_lora) must produce
    the same U-Net output as running with the diagonal scale — the demo
    path (`run_gradio_demo.py:10-29`) vs the training path are one math."""
    import flax.traverse_util as tu
    unet = UNet2DConditionModel(CFG.unet)
    x = jax.random.normal(KEY, (1, 16, 16, 4))
    ctx = jax.random.normal(KEY, (1, 77, CFG.unet.cross_attention_dim))
    t = jnp.array([100])
    p0 = unet.init(KEY, x, t, ctx, jnp.ones((1, CFG.unet.lora.rank)))["params"]
    lora_state = io.load_safetensors(
        os.path.join(train_folder, "pytorch_lora_weights.safetensors"))
    params = io.import_lora_safetensors(p0, CFG.unet, lora_state)

    bitstring, folded = create_watermark_lora(
        train_folder, scale=1.03, msg_bits=CFG.watermark.msg_bits,
        save=False, rng=np.random.default_rng(5))
    mapper_state = io.load_safetensors(
        os.path.join(train_folder, "mapper.safetensors"))
    bits = np.array([int(c) for c in bitstring])
    diag = jnp.asarray(mapper_diag_from_state(mapper_state, bits) * 1.03)

    out_diag = unet.apply({"params": params}, x, t, ctx, diag)
    params_folded = io.import_lora_safetensors(p0, CFG.unet, folded)
    out_folded = unet.apply({"params": params_folded}, x, t, ctx, 1.0)
    np.testing.assert_allclose(np.asarray(out_diag), np.asarray(out_folded),
                               atol=1e-3)


def test_webui_layout_roundtrip(train_folder):
    state = io.load_safetensors(
        os.path.join(train_folder, "pytorch_lora_weights.safetensors"))
    webui = diffusers_to_webui(state)
    assert all(k.startswith("lora_unet_") for k in webui)
    assert any(".lora_up." in k for k in webui)
    assert any(".lora_down." in k for k in webui)
    back = webui_to_diffusers(webui)
    # webui->diffusers drops ff and proj keys by design (`:9-11`) and emits
    # keys without the "unet." prefix (load_attn_procs convention)
    attn_orig = {k[len("unet."):]: v for k, v in state.items()
                 if ".processor." in k}
    assert set(back) == set(attn_orig)
    for k in back:
        np.testing.assert_allclose(back[k], attn_orig[k])


def test_create_wm_lora_rejects_mapper_mismatch_and_bad_hidinfo(train_folder):
    """A msg_bits that differs from the trained mapper width (including a
    MULTIPLE, which used to fold only the first row while returning the
    full-length bitstring) and non-binary hidinfo raise real errors."""
    bits = CFG.watermark.msg_bits
    with pytest.raises(ValueError, match="trained mapper"):
        create_watermark_lora(train_folder, msg_bits=bits * 2, save=False)
    with pytest.raises(ValueError, match="bits"):
        create_watermark_lora(train_folder, msg_bits=bits,
                              hidinfo="1" * (bits + 1), save=False)
    with pytest.raises(ValueError, match="0/1"):
        create_watermark_lora(train_folder, msg_bits=bits,
                              hidinfo="2" * bits, save=False)


def test_port_rejects_empty_train_folder(tmp_path):
    """A typo'd --train_folder must raise, not exit 0 having written
    nothing."""
    from aqualora_tpu.tools.port_reference_artifacts import port
    empty = tmp_path / "ppft_traind"      # the classic typo
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="found none"):
        port(str(tmp_path / "out"), train_folder=str(empty))
