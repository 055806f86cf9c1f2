"""PPFT checkpoint/resume: save at step k, resume 'latest', continue."""

import os

import pytest


def test_ppft_resume_latest(tmp_path):
    from aqualora_tpu.train import ppft_train

    out = str(tmp_path / "ppft")
    os.makedirs(out, exist_ok=True)
    base = ["--tiny", "--train_batch_size", "2", "--output_dir", out,
            "--checkpointing_steps", "2", "--validation_epochs", "0",
            "--seed", "3"]
    args = ppft_train.build_argparser().parse_args(
        base + ["--max_train_steps", "2"])
    ppft_train.run(args)
    assert os.path.isdir(os.path.join(out, "checkpoints"))

    args2 = ppft_train.build_argparser().parse_args(
        base + ["--max_train_steps", "4",
                "--resume_from_checkpoint", "latest"])
    res = ppft_train.run(args2)
    # resumed at step 2 -> only 2 more steps recorded
    assert len(res["history"]) == 2


def test_stage3_resume_latest(tmp_path):
    """Stage 3 advertises --resume_from_checkpoint (shared ppft parser);
    it must actually restore decoder/optimizer/step, not restart."""
    from aqualora_tpu.train import rob_enhance_finetune as s3

    out = str(tmp_path / "s3")
    os.makedirs(out, exist_ok=True)
    base = ["--tiny", "--train_batch_size", "2", "--output_dir", out,
            "--checkpointing_steps", "2", "--log_every", "1", "--seed", "5"]
    args = s3.build_argparser().parse_args(base + ["--max_train_steps", "2"])
    s3.run(args)
    assert os.path.isdir(os.path.join(out, "checkpoints"))

    args2 = s3.build_argparser().parse_args(
        base + ["--max_train_steps", "4",
                "--resume_from_checkpoint", "latest"])
    res = s3.run(args2)
    # resumed at step 2 -> steps 3 and 4 only
    assert len(res["history"]) == 2
