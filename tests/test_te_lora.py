"""Text-encoder LoRA: export/import round trip in the reference key layout
(`train/ppft_train.py:69-91,1210-1221`), trainer save/resume wiring, the
`--mapper_std` knob, and the end-of-training sanity inference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_te_params(rank=4):
    from aqualora_tpu.core.config import CLIPTextConfig
    from aqualora_tpu.models.clip import CLIPTextModel
    cfg = CLIPTextConfig.tiny().with_lora(rank)
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, 77), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, 1.0)["params"]
    return cfg, model, params


def test_te_lora_export_import_roundtrip():
    from aqualora_tpu.core import io
    cfg, _, params = _tiny_te_params()
    # randomize lora leaves so the round trip is non-trivial
    from flax import traverse_util as tu
    rng = np.random.default_rng(0)
    flat = dict(tu.flatten_dict(params))
    for k in flat:
        if "lora" in k:
            flat[k] = rng.standard_normal(flat[k].shape).astype(np.float32)
    params = tu.unflatten_dict(flat)

    state = io.export_te_lora_safetensors(params, cfg)
    # reference layout: attn + mlp keys per layer, prefixed text_encoder.
    assert len(state) == cfg.num_layers * (4 + 2) * 2
    assert ("text_encoder.text_model.encoder.layers.0.self_attn."
            "to_q_lora.down.weight" in state)
    assert ("text_encoder.text_model.encoder.layers.0.mlp.fc1."
            "lora_linear_layer.up.weight" in state)
    # torch orientation: down is [rank, in]
    d = state["text_encoder.text_model.encoder.layers.0.self_attn."
              "to_q_lora.down.weight"]
    assert d.shape == (4, cfg.hidden_size)

    zeroed = tu.unflatten_dict(
        {k: (np.zeros_like(v) if "lora" in k else v) for k, v in flat.items()})
    restored = io.import_te_lora_safetensors(zeroed, cfg, state)
    rf = tu.flatten_dict(restored)
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(rf[k]), np.asarray(v))


def test_te_lora_changes_encoding():
    """MLP + attn LoRA actually contribute at scale 1.0 (patch_mlp=True
    parity, ppft_train.py:696)."""
    from flax import traverse_util as tu
    cfg, model, params = _tiny_te_params()
    ids = jnp.arange(77, dtype=jnp.int32)[None] % cfg.vocab_size
    base = model.apply({"params": params}, ids, None)
    same = model.apply({"params": params}, ids, 1.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)

    flat = dict(tu.flatten_dict(params))
    bumped_attn, bumped_mlp = dict(flat), dict(flat)
    for k in flat:
        if "lora" in k and k[-2] == "up":
            t = np.asarray(flat[k]) + 0.1
            (bumped_mlp if "mlp" in k else bumped_attn)[k] = t
    out_attn = model.apply({"params": tu.unflatten_dict(bumped_attn)}, ids, 1.0)
    out_mlp = model.apply({"params": tu.unflatten_dict(bumped_mlp)}, ids, 1.0)
    assert not np.allclose(np.asarray(out_attn), np.asarray(base))
    assert not np.allclose(np.asarray(out_mlp), np.asarray(base))


def test_mapper_std_wiring():
    """--mapper_std flows into WatermarkConfig and changes the mapper init
    (the reference's MapperNet std knob, utils/models.py:100,106-108)."""
    from aqualora_tpu.train import ppft_train
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--mapper_std", "0.25"])
    cfg, _, _ = ppft_train.build_configs(args)
    assert cfg.watermark.mapper_std == 0.25

    from aqualora_tpu.models.watermark import MapperNet
    msg = jnp.ones((1, 8))
    outs = {}
    for std in (1.0, 0.25):
        m = MapperNet(8, 4, std)
        p = m.init(jax.random.PRNGKey(0), msg)["params"]
        outs[std] = np.asarray(m.apply({"params": p}, msg))
    # (out - 1) scales linearly with std
    np.testing.assert_allclose(outs[0.25] - 1.0, (outs[1.0] - 1.0) * 0.25,
                               rtol=1e-5)


@pytest.mark.slow
def test_ppft_te_lora_save_resume_and_final_inference(tmp_path):
    """--train_text_encoder saves te keys into the LoRA safetensors, the
    final sanity inference runs on the reloaded artifacts, and
    --resume_from_lora restores the te-LoRA (not silently dropped)."""
    from aqualora_tpu.core import io
    from aqualora_tpu.train import ppft_train

    out = str(tmp_path / "ppft_te")
    os.makedirs(out, exist_ok=True)
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "100",
         "--validation_epochs", "0", "--seed", "0", "--train_text_encoder",
         "--validation_prompt", "a tiny test", "--num_validation_images", "1"])
    ppft_train.run(args)

    state = io.load_safetensors(
        os.path.join(out, "pytorch_lora_weights.safetensors"))
    te_keys = [k for k in state if k.startswith("text_encoder.")]
    unet_keys = [k for k in state if k.startswith("unet.")]
    assert te_keys and unet_keys
    # tiny CLIP: 2 layers x (4 attn + 2 mlp) x 2 tensors
    assert len(te_keys) == 2 * 6 * 2

    # resume: te-LoRA keys load back into the text tower
    args2 = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "1", "--train_batch_size", "2",
         "--output_dir", str(tmp_path / "ppft_te2"),
         "--checkpointing_steps", "100", "--validation_epochs", "0",
         "--seed", "1", "--train_text_encoder", "--resume_from_lora", out])
    res2 = ppft_train.run(args2)
    assert "te_lora" in res2["trainable"]
