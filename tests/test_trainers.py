"""Trainer smoke coverage (tiny configs, 2 steps each): all three stages
run end-to-end, write artifacts, and honor their curriculum/config paths."""

import os

import numpy as np
import pytest


def test_stage1_curriculum_and_artifacts(tmp_path):
    from aqualora_tpu.train import latent_wm_pretrain as s1
    out = str(tmp_path / "s1")
    os.makedirs(out, exist_ok=True)
    args = s1.build_argparser().parse_args(
        ["--tiny", "--epochs", "1", "--batch_size", "2",
         "--max_train_steps", "2", "--output_dir", out, "--log_every", "1"])
    res = s1.run(args)
    assert len(res["history"]) == 2
    # warmup regime: msg-only loss => lpips weight 0
    assert res["history"][0]["lpips_loss"] == 0.0
    assert os.path.isdir(os.path.join(out, "pretrained_latentwm"))
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    assert os.path.exists(os.path.join(out, "log_images", "watermarked_0.png"))


def test_stage3_decoder_only_updates(tmp_path):
    from aqualora_tpu.train import rob_enhance_finetune as s3
    out = str(tmp_path / "s3")
    os.makedirs(out, exist_ok=True)
    args = s3.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "99"])
    res = s3.run(args)
    assert len(res["history"]) == 2
    assert all(np.isfinite(m["loss"]) for m in res["history"])
    assert os.path.isdir(os.path.join(out, "msgdecoder"))
