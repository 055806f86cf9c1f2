"""LDM <-> diffusers conversion and merge_lora math tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util as tu

from aqualora_tpu.core import io
from aqualora_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
from aqualora_tpu.tools import ldm_convert
from aqualora_tpu.tools.merge_lora import merge_lora_into_states


def _fake_torch_state(module, init_args, exclude=("lora",)):
    """Zero-memory torch-layout state with real shapes via eval_shape."""
    shapes = jax.eval_shape(lambda: module.init(*init_args))["params"]
    flat = tu.flatten_dict(shapes)
    out = {}
    for path, leaf in flat.items():
        if any(e in path for e in exclude):
            continue
        tpath, v = io.flax_tensor_to_torch(
            path, np.broadcast_to(np.zeros(1, np.float32), leaf.shape))
        out[io.flax_path_to_torch_key(tpath)] = v
    return out


@pytest.fixture(scope="module")
def sd15_states():
    from aqualora_tpu.models.clip import CLIPTextModel
    from aqualora_tpu.models.unet import UNet2DConditionModel
    from aqualora_tpu.models.vae import AutoencoderKL

    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(UNetConfig.sd15())
    u_state = _fake_torch_state(unet, (key, jnp.zeros((1, 8, 8, 4)),
                                       jnp.zeros((1,)),
                                       jnp.zeros((1, 77, 768)), None))
    vae = AutoencoderKL(VAEConfig.sd15())
    v_state = _fake_torch_state(vae, (key, jnp.zeros((1, 64, 64, 3)), key))
    v_state = {f"{'encoder.' if False else ''}{k}": v
               for k, v in v_state.items()}
    clip = CLIPTextModel(CLIPTextConfig.sd15())
    t_state = _fake_torch_state(clip, (key, jnp.zeros((1, 77), jnp.int32)))
    t_state = {f"text_model.{k}": v for k, v in t_state.items()}
    return u_state, v_state, t_state


def test_unet_ldm_roundtrip(sd15_states):
    u_state, _, _ = sd15_states
    ldm = ldm_convert.unet_diffusers_to_ldm(u_state)
    assert len(ldm) == len(u_state)
    assert all(k.startswith("model.diffusion_model.") for k in ldm)
    # spot-check canonical LDM keys exist
    for k in ("model.diffusion_model.input_blocks.0.0.weight",
              "model.diffusion_model.input_blocks.1.0.in_layers.2.weight",
              "model.diffusion_model.input_blocks.1.1.proj_in.weight",
              "model.diffusion_model.input_blocks.3.0.op.weight",
              "model.diffusion_model.middle_block.1.norm.weight",
              "model.diffusion_model.output_blocks.2.1.conv.weight",
              "model.diffusion_model.output_blocks.5.2.conv.weight",
              "model.diffusion_model.time_embed.0.weight",
              "model.diffusion_model.out.2.bias"):
        assert k in ldm, k
    back = ldm_convert.unet_ldm_to_diffusers(ldm)
    assert set(back) == set(u_state)


def test_vae_ldm_roundtrip(sd15_states):
    _, v_state, _ = sd15_states
    ldm = ldm_convert.vae_diffusers_to_ldm(v_state)
    assert len(ldm) == len(v_state)
    for k in ("first_stage_model.encoder.down.0.block.0.conv1.weight",
              "first_stage_model.encoder.down.0.downsample.conv.weight",
              "first_stage_model.encoder.mid.attn_1.q.weight",
              "first_stage_model.decoder.up.3.block.0.conv1.weight",
              "first_stage_model.decoder.up.1.upsample.conv.weight",
              "first_stage_model.quant_conv.weight"):
        assert k in ldm, k
    # q/k/v weights are 1x1 convs in LDM
    assert ldm["first_stage_model.encoder.mid.attn_1.q.weight"].ndim == 4
    back = ldm_convert.vae_ldm_to_diffusers(ldm)
    assert set(back) == set(v_state)
    assert back["encoder.mid_block.attentions.0.to_q.weight"].ndim == 2


def test_clip_ldm_roundtrip(sd15_states):
    _, _, t_state = sd15_states
    ldm = ldm_convert.clip_diffusers_to_ldm(t_state)
    assert all(k.startswith("cond_stage_model.transformer.text_model.")
               for k in ldm)
    back = ldm_convert.clip_ldm_to_diffusers(ldm)
    assert set(back) == set(t_state)


@pytest.fixture(scope="module")
def sd21_states():
    """Real SD-2.1 shapes (zero-memory eval_shape): 64-dim heads / 1024
    cross-dim U-Net, 23-layer open-CLIP-sized text tower."""
    from aqualora_tpu.models.clip import CLIPTextModel
    from aqualora_tpu.models.unet import UNet2DConditionModel

    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(UNetConfig.sd21())
    u_state = _fake_torch_state(unet, (key, jnp.zeros((1, 8, 8, 4)),
                                       jnp.zeros((1,)),
                                       jnp.zeros((1, 77, 1024)), None))
    clip = CLIPTextModel(CLIPTextConfig.sd2())
    t_state = _fake_torch_state(clip, (key, jnp.zeros((1, 77), jnp.int32)))
    t_state = {f"text_model.{k}": v for k, v in t_state.items()}
    return u_state, t_state


def test_unet_v2_proj_roundtrip(sd21_states):
    """v2-LDM stores transformer proj_in/proj_out as Linear; the conv<->
    linear reshape must round-trip on the real SD-2.1 U-Net topology."""
    u_state, _ = sd21_states
    ldm = ldm_convert.unet_diffusers_to_ldm(u_state)
    ldm_convert.unet_proj_conv_to_linear(ldm)
    proj = [k for k in ldm if k.endswith(("proj_in.weight",
                                          "proj_out.weight"))]
    assert proj and all(ldm[k].ndim == 2 for k in proj)
    back = ldm_convert.unet_ldm_to_diffusers(ldm)
    ldm_convert.unet_proj_linear_to_conv(back)
    assert set(back) == set(u_state)
    assert all(back[k].shape == u_state[k].shape for k in u_state)


def test_clip_v2_roundtrip(sd21_states):
    """open-CLIP tower round trip at SD-2.1 scale: fused qkv, dummy
    resblock 23 / text_projection / logit_scale, then back to HF layout
    with the extras dropped (model_util.py:560-640,1083-1151)."""
    _, t_state = sd21_states
    ldm = ldm_convert.clip_v2_diffusers_to_ldm(t_state,
                                               make_dummy_weights=True)
    assert ldm["cond_stage_model.model.transformer.resblocks.0."
               "attn.in_proj_weight"].shape == (3072, 1024)
    assert ("cond_stage_model.model.transformer.resblocks.23.ln_1.weight"
            in ldm)
    assert ldm["cond_stage_model.model.text_projection"].shape == \
        (1024, 1024)
    # some v2 checkpoints (waifu-diffusion v1.4) carry an explicit
    # position_ids buffer the reference converter special-cases and
    # drops (model_util.py:638-647) — must be tolerated, not KeyError
    ldm["cond_stage_model.model.transformer.text_model.embeddings."
        "position_ids"] = np.arange(77)[None]
    back = ldm_convert.clip_v2_ldm_to_diffusers(ldm)
    assert not any("position_ids" in k for k in back)
    # back is in the full HF layout (encoder./embeddings. wrappers); the
    # fixture is in this repo's flat torch layout — compare normalized
    norm = {k.replace(".encoder.", ".").replace(".embeddings.", "."): v
            for k, v in back.items()}
    assert set(norm) == set(t_state)
    assert all(norm[k].shape == t_state[k].shape for k in t_state)


def test_clip_v2_qkv_fuse_math():
    """q/k/v <-> fused in_proj must be a value-exact round trip in the
    reference's concatenation order (q, k, v — model_util.py:628-639)."""
    rng = np.random.RandomState(0)
    d = 8
    state = {}
    for name in ("q_proj", "k_proj", "v_proj"):
        state[f"text_model.layers.0.self_attn.{name}.weight"] = \
            rng.randn(d, d).astype(np.float32)
        state[f"text_model.layers.0.self_attn.{name}.bias"] = \
            rng.randn(d).astype(np.float32)
    ldm = ldm_convert.clip_v2_diffusers_to_ldm(state)
    fused = ldm["cond_stage_model.model.transformer.resblocks.0."
                "attn.in_proj_weight"]
    np.testing.assert_array_equal(
        fused[:d], state["text_model.layers.0.self_attn.q_proj.weight"])
    np.testing.assert_array_equal(
        fused[2 * d:], state["text_model.layers.0.self_attn.v_proj.weight"])
    back = ldm_convert.clip_v2_ldm_to_diffusers(ldm)
    for name in ("q_proj", "k_proj", "v_proj"):
        for leaf in ("weight", "bias"):
            np.testing.assert_array_equal(
                back[f"text_model.encoder.layers.0.self_attn.{name}.{leaf}"],
                state[f"text_model.layers.0.self_attn.{name}.{leaf}"])


def test_full_v2_checkpoint_roundtrip(sd21_states, sd15_states):
    """Whole-checkpoint v2 path: diffusers -> single-file -> diffusers with
    auto-detection; the VAE's mid-attn proj_out must stay a 1x1 conv."""
    u_state, t_state = sd21_states
    _, v_state, _ = sd15_states          # VAE is identical across versions
    ldm = ldm_convert.diffusers_to_ldm(u_state, v_state, t_state, v2=True)
    assert ldm_convert.detect_v2(ldm)
    assert ldm["first_stage_model.decoder.mid.attn_1.proj_out.weight"
               ].ndim == 4
    u2, v2, t2 = ldm_convert.ldm_to_diffusers(ldm)   # auto-detects v2
    assert set(u2) == set(u_state)
    assert all(u2[k].shape == u_state[k].shape for k in u_state)
    assert set(v2) == set(v_state)
    norm = {k.replace(".encoder.", ".").replace(".embeddings.", "."): v
            for k, v in t2.items()}
    assert set(norm) == set(t_state)


def test_merge_lora_linear_math():
    rank, out_f, in_f = 4, 6, 5
    rng = np.random.RandomState(0)
    w0 = rng.randn(out_f, in_f).astype(np.float32)
    unet_state = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            w0.copy()}
    down = rng.randn(rank, in_f).astype(np.float32)
    up = rng.randn(out_f, rank).astype(np.float32)
    name = ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
            "_attn1_to_q")
    lora = {f"{name}.lora_down.weight": down,
            f"{name}.lora_up.weight": up,
            f"{name}.alpha": np.float32(2.0)}
    merge_lora_into_states(unet_state, {}, lora, ratio=0.5)
    expect = w0 + 0.5 * (2.0 / rank) * (up @ down)
    np.testing.assert_allclose(
        unet_state["down_blocks.0.attentions.0.transformer_blocks.0"
                   ".attn1.to_q.weight"], expect, rtol=1e-6)


def test_merge_lora_conv_math():
    rank, out_f, in_f = 2, 3, 4
    rng = np.random.RandomState(1)
    w0 = rng.randn(out_f, in_f, 1, 1).astype(np.float32)
    unet_state = {"down_blocks.0.attentions.0.proj_in.weight": w0.copy()}
    down = rng.randn(rank, in_f, 1, 1).astype(np.float32)
    up = rng.randn(out_f, rank, 1, 1).astype(np.float32)
    name = "lora_unet_down_blocks_0_attentions_0_proj_in"
    lora = {f"{name}.lora_down.weight": down,
            f"{name}.lora_up.weight": up}
    merge_lora_into_states(unet_state, {}, lora, ratio=1.0)
    expect = w0 + (up[:, :, 0, 0] @ down[:, :, 0, 0])[:, :, None, None]
    np.testing.assert_allclose(
        unet_state["down_blocks.0.attentions.0.proj_in.weight"], expect,
        rtol=1e-5)


def test_merge_lora_layout_mismatch_and_skip(capsys):
    """Reference parity (merge_lora.py:93-95,108-111): a conv-1x1 LoRA
    merges into a LINEAR base weight (SD2 use_linear_projection) by
    squeezing — numpy broadcasting would silently build an [O,I,O,I]
    tensor — and unknown LoRA modules are skipped with a message, not a
    KeyError after a half-applied merge."""
    rank, out_f, in_f = 2, 3, 4
    rng = np.random.RandomState(2)
    # base proj is Linear (2-D), LoRA is conv layout (4-D 1x1)
    w0 = rng.randn(out_f, in_f).astype(np.float32)
    unet_state = {"down_blocks.0.attentions.0.proj_in.weight": w0.copy()}
    down = rng.randn(rank, in_f, 1, 1).astype(np.float32)
    up = rng.randn(out_f, rank, 1, 1).astype(np.float32)
    name = "lora_unet_down_blocks_0_attentions_0_proj_in"
    lora = {f"{name}.lora_down.weight": down,
            f"{name}.lora_up.weight": up,
            # module outside the site table: skipped with a message
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight":
                rng.randn(rank, in_f, 3, 3).astype(np.float32),
            "lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight":
                rng.randn(out_f, rank, 1, 1).astype(np.float32)}
    merge_lora_into_states(unet_state, {}, lora, ratio=1.0)
    got = unet_state["down_blocks.0.attentions.0.proj_in.weight"]
    assert got.shape == (out_f, in_f)
    np.testing.assert_allclose(
        got, w0 + up[:, :, 0, 0] @ down[:, :, 0, 0], rtol=1e-5)
    assert "no module found for LoRA weight" in capsys.readouterr().out
    # the reverse mismatch: linear LoRA into a 1x1-conv base weight
    w1 = rng.randn(out_f, in_f, 1, 1).astype(np.float32)
    unet_state2 = {"down_blocks.0.attentions.0.proj_in.weight": w1.copy()}
    lora2 = {f"{name}.lora_down.weight": down[:, :, 0, 0],
             f"{name}.lora_up.weight": up[:, :, 0, 0]}
    merge_lora_into_states(unet_state2, {}, lora2, ratio=1.0)
    np.testing.assert_allclose(
        unet_state2["down_blocks.0.attentions.0.proj_in.weight"],
        w1 + (up[:, :, 0, 0] @ down[:, :, 0, 0])[:, :, None, None],
        rtol=1e-5)


def test_merge_cli_forwards_v2_to_ldm_layout(monkeypatch, tmp_path):
    """`merge --v2` must SAVE in the v2 single-file layout: the reference
    forwards v2 to save_stable_diffusion_checkpoint (merge_lora.py:178);
    dropping it writes a v1-layout text tower that is garbage for any
    SD2 consumer while exiting 0."""
    import argparse

    from aqualora_tpu.tools import merge_lora as ml

    seen = {}

    def fake_to_ldm(unet, vae, te, v2=False, **kw):
        seen["v2"] = v2
        return {"x": np.zeros((1,), np.float32)}

    monkeypatch.setattr(ml, "load_sd_states", lambda p: ({}, {}, {}))
    monkeypatch.setattr(ml.ldm_convert, "diffusers_to_ldm", fake_to_ldm)
    monkeypatch.setattr(ml.io, "load_safetensors", lambda p: {})
    args = argparse.Namespace(
        sd_model="base.safetensors", save_to=str(tmp_path / "o.safetensors"),
        models=[], ratios=None, precision="fp32", v2=True, no_metadata=True)
    ml.merge(args)
    assert seen["v2"] is True
