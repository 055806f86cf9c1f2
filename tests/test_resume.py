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
