"""End-to-end integration: train (tiny) -> export -> fold message ->
generate -> decode.  The full artifact flow of SURVEY.md §1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_full_workflow(tmp_path):
    from aqualora_tpu.train import ppft_train

    out = str(tmp_path / "ppft")
    os.makedirs(out, exist_ok=True)
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "100",
         "--validation_epochs", "0", "--seed", "0"])
    result = ppft_train.run(args)
    assert os.path.exists(os.path.join(out, "pytorch_lora_weights.safetensors"))
    assert os.path.exists(os.path.join(out, "mapper.safetensors"))

    # fold a message (create_wm_lora) and generate + decode with tiny config
    from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
    from aqualora_tpu.eval.utils_eval import simple_decode, simple_sample
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora

    cfg = PipelineConfig.tiny()
    bits = cfg.watermark.msg_bits
    bitstring, lora = create_watermark_lora(out, scale=1.03, msg_bits=bits,
                                            save=False,
                                            rng=np.random.default_rng(0))
    assert len(bitstring) == bits

    images = simple_sample(None, "ddim", ["a tiny test"], lora=lora,
                           seeds=[0], num_inference_steps=2, batch_size=1,
                           resolution=32, config=cfg,
                           params=result["params"])
    assert len(images) == 1 and images[0].size == (32, 32)

    bitacc, tpr, decoded = simple_decode(
        bits, os.path.join(out, "msgdecoder"), images, msg_gt=bitstring,
        backbone=EfficientNetConfig.tiny(), tpr_threshold=1e-2)
    # untrained tiny model: just verify the plumbing produced valid outputs
    assert len(decoded) == 1 and len(decoded[0]) == bits
    assert 0.0 <= bitacc <= 1.0 and tpr in (0.0, 1.0)


def test_fpr_threshold_math():
    """tau from the binomial tail (utils_eval.py:131-140): exact values."""
    from aqualora_tpu.eval.utils_eval import calculate_fpr, get_threshold
    # k=48: P[more than tau matches] for random bits
    assert abs(calculate_fpr(23, 48) - sum(
        __import__("math").comb(48, i) for i in range(24, 49)) / 2 ** 48) < 1e-12
    tau6 = get_threshold(48, 1e-6)
    assert calculate_fpr(tau6, 48) <= 1e-6 < calculate_fpr(tau6 - 1, 48)
    tau3 = get_threshold(48, 1e-3)
    assert tau3 < tau6
