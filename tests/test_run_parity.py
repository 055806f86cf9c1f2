"""The one-command real-weight parity runbook (scripts/run_parity.py)
chains port -> golden gate -> run_eval_base -> run_fid -> PARITY.json.
Runs here on synthetic tiny artifacts so the chain is certified before
the published checkpoints are reachable."""

import importlib.util
import json
import os

import numpy as np
import pytest


def _parity():
    spec = importlib.util.spec_from_file_location(
        "run_parity", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "run_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_run_parity_synthetic_tiny(tmp_path):
    from PIL import Image

    # tiny FID ground-truth set + captions
    gt = tmp_path / "gt"
    gt.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(gt / f"{i}.png")
    meta = tmp_path / "meta.jsonl"
    meta.write_text('{"text": "a red fox"}\n{"text": "a blue bird"}\n')

    parity = _parity()
    args = parity.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--out", str(tmp_path / "parity"),
         "--gate_num_prompts", "1", "--batch_size", "1",
         "--skip_merge", "--skip_int8",
         "--eval_num_prompts", "2", "--eval_num_seeds", "1",
         "--fid_meta", str(meta), "--fid_gt_dir", str(gt),
         "--fid_num_images", "2"])
    result = parity.run(args)

    assert result["synthetic"] is True
    assert 0.0 <= result["gate"]["bit_acc"] <= 1.0
    assert result["eval_base"]["n_images"] == 2
    assert np.isfinite(result["fid"]["fid"])
    assert result["fid"]["random_inception"] is True
    out = json.load(open(tmp_path / "parity" / "PARITY.json"))
    assert out["eval_base"]["bit_acc"] == result["eval_base"]["bit_acc"]
