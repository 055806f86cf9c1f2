"""Device-side LoRA folding == per-step diag scaling (the serving path)."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline

KEY = jax.random.PRNGKey(0)


def test_fold_message_equals_runtime_scale():
    pipe = StableDiffusionPipeline(PipelineConfig.tiny())
    params = pipe.init_params(KEY, 32, 32)
    # nonzero lora ups so folding matters
    flat = tu.flatten_dict(params["unet"])
    for k in flat:
        if "lora" in k:
            flat[k] = jax.random.normal(jax.random.PRNGKey(len(str(k))),
                                        flat[k].shape) * 0.1
    params["unet"] = tu.unflatten_dict(flat)

    bits = pipe.config.watermark.msg_bits
    msg = jax.random.bernoulli(KEY, 0.5, (bits,)).astype(jnp.float32)
    diag = pipe.message_scale(params, msg.reshape(1, -1))

    x = jax.random.normal(KEY, (1, 8, 8, 4))
    ctx = jax.random.normal(KEY, (1, 77, pipe.config.unet.cross_attention_dim))
    t = jnp.array([100])
    out_runtime = pipe.unet.apply({"params": params["unet"]}, x, t, ctx, diag)

    folded = pipe.fold_message(params, msg)
    out_folded = pipe.unet.apply({"params": folded["unet"]}, x, t, ctx, None)
    np.testing.assert_allclose(np.asarray(out_runtime),
                               np.asarray(out_folded), atol=2e-3, rtol=1e-3)
    # and the fold must actually change the output vs no-lora
    out_base = pipe.unet.apply({"params": params["unet"]}, x, t, ctx, None)
    assert np.abs(np.asarray(out_folded - out_base)).max() > 1e-4


def test_simple_sample_per_image_messages(tmp_path):
    """messages=[A,B] in ONE batch: row i carries message i (the
    capability the reference lacks — it folds one LoRA per message,
    `run_gradio_demo.py:10-29`), and the per-sample diag path reproduces
    the create_wm_lora fold end to end."""
    from aqualora_tpu.core.config import EfficientNetConfig
    from aqualora_tpu.eval.utils_eval import simple_sample
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora
    from aqualora_tpu.tools.synthetic_artifacts import (
        synthesize_reference_artifacts)

    cfg = PipelineConfig.tiny()
    bits, rank = cfg.watermark.msg_bits, cfg.unet.lora.rank
    synthesize_reference_artifacts(
        str(tmp_path), msg_bits=bits, rank=rank, unet=cfg.unet,
        backbone=EfficientNetConfig.tiny(num_classes=bits * 2), seed=0)
    tf = str(tmp_path / "ppft_trained")
    msg_a, msg_b = "01" * (bits // 2), "10" * (bits // 2)
    kw = dict(seeds=[3], num_inference_steps=2, batch_size=2,
              resolution=64, config=cfg, guidance_scale=3.0)
    prompts = ["a cat", "a dog"]

    ab = simple_sample(None, "ddim", prompts,
                       messages=[msg_a, msg_b], train_folder=tf, **kw)
    aa = simple_sample(None, "ddim", prompts,
                       messages=[msg_a, msg_a], train_folder=tf, **kw)
    ab0, ab1 = (np.asarray(i) for i in ab)
    aa0, aa1 = (np.asarray(i) for i in aa)
    assert np.array_equal(ab0, aa0)    # row 1's message cannot leak into row 0
    assert not np.array_equal(ab1, aa1)            # messages act per-sample

    # fold(A) == runtime diag(A) end to end (through PIL uint8 rounding)
    _, folded = create_watermark_lora(tf, scale=1.03, msg_bits=bits,
                                      hidinfo=msg_a, save=False)
    f0 = np.asarray(simple_sample(None, "ddim", prompts, lora=folded,
                                  **kw)[0])
    assert np.abs(f0.astype(np.int16) - ab0.astype(np.int16)).max() <= 2


def test_run_demo_multi_secret_plumbing(monkeypatch):
    """run_demo.process(--secret a,b[,blank]) routes through the
    per-image messages path: one simple_sample call, batch == #secrets,
    blanks filled with seeded-random bitstrings."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "run_demo", _os.path.join(_os.path.dirname(__file__), "..",
                                  "run_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    calls = {}

    def fake_sample(model, sampler, prompts, **kw):
        calls.update(kw, prompts=prompts)
        return ["img"] * len(prompts)

    monkeypatch.setattr(demo, "simple_sample", fake_sample)
    msg_a, msg_b = "01" * 4, "10" * 4
    images, bitstring, decoded = demo.process(
        None, "/nonexistent_folder", f"{msg_a},{msg_b},", "a cat",
        msg_bits=8, seed=5)
    assert len(images) == 3 and decoded is None
    assert calls["messages"] == bitstring
    assert bitstring[:2] == [msg_a, msg_b]
    assert len(bitstring[2]) == 8 and set(bitstring[2]) <= {"0", "1"}
    assert calls["train_folder"] == "/nonexistent_folder"
    assert calls["batch_size"] == 3 and calls["prompts"] == ["a cat"] * 3
