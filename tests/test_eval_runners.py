"""Eval benchmark runners end-to-end on tiny artifacts (the reference's
run_eval_base / run_eval_distortion protocols as acceptance tests)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Train a 2-step tiny PPFT to produce the artifact folder."""
    from aqualora_tpu.train import ppft_train
    out = str(tmp_path_factory.mktemp("artifacts"))
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "1", "--train_batch_size", "2",
         "--output_dir", out, "--checkpointing_steps", "99",
         "--validation_epochs", "0"])
    ppft_train.run(args)
    return out


def _run_main(module, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_run_eval_base_tiny(artifacts, tmp_path, capsys):
    from aqualora_tpu.eval import run_eval_base
    _run_main(run_eval_base,
              ["--train_folder", artifacts,
               "--msgdecoder_path", os.path.join(artifacts, "msgdecoder"),
               "--output_dir", str(tmp_path / "eval"),
               "--num_prompts", "2", "--num_seeds", "1",
               "--batch_size", "2", "--fpr", "1e-2", "--tiny"])
    out = capsys.readouterr().out
    assert "FINAL bit_accuracy=" in out
    assert "TPR=" in out


def test_run_eval_base_tiny_int8(artifacts, tmp_path, capsys):
    """--int8 routes through simple_sample(int8=...): the throughput
    opt-in on the eval runners (docs/EVALUATION.md 'int8 vs protocol')."""
    from aqualora_tpu.eval import run_eval_base
    _run_main(run_eval_base,
              ["--train_folder", artifacts,
               "--msgdecoder_path", os.path.join(artifacts, "msgdecoder"),
               "--output_dir", str(tmp_path / "eval_int8"),
               "--num_prompts", "2", "--num_seeds", "1",
               "--batch_size", "2", "--fpr", "1e-2", "--tiny", "--int8"])
    out = capsys.readouterr().out
    assert "FINAL bit_accuracy=" in out


def test_run_eval_distortion_tiny(artifacts, tmp_path, capsys):
    from aqualora_tpu.eval import run_eval_distortion
    _run_main(run_eval_distortion,
              ["--train_folder", artifacts,
               "--msgdecoder_path", os.path.join(artifacts, "msgdecoder"),
               "--output_dir", str(tmp_path / "evald"),
               "--num_prompts", "2", "--batch_size", "2", "--fpr", "1e-2",
               "--tiny", "--distortions", "jpeg_compress,crop"])
    out = capsys.readouterr().out
    assert "jpeg_compress: bit_accuracy=" in out
    assert "SUMMARY:" in out


def test_run_fid_tiny(artifacts, tmp_path, capsys):
    """run_fid end-to-end on tiny config: gen vs itself ~= 0 FID; the
    random-init Inception requires the explicit allow flag."""
    import json

    from aqualora_tpu.eval import run_fid
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps(["a cat", "a dog"]))
    out = str(tmp_path / "fid")
    gen_dir = os.path.join(out, "images")
    with pytest.raises(SystemExit, match="no Inception weights"):
        _run_main(run_fid, ["--meta_data", str(meta), "--gt_dir", gen_dir,
                            "--train_folder", artifacts,
                            "--output_dir", out, "--num_images", "2",
                            "--batch_size", "2", "--tiny"])
    _run_main(run_fid, ["--meta_data", str(meta), "--gt_dir", gen_dir,
                        "--train_folder", artifacts, "--output_dir", out,
                        "--num_images", "2", "--batch_size", "2", "--tiny",
                        "--allow_random_inception"])
    printed = capsys.readouterr().out
    assert "FID:" in printed
    fid_val = float(printed.rsplit("FID:", 1)[1].strip())
    assert abs(fid_val) < 1e-3          # gen dir vs itself


def test_run_dreamsim_tiny(artifacts, tmp_path, capsys):
    """run_dreamsim end-to-end on tiny config (paired seeds with/without
    LoRA); random-init ensemble requires the explicit allow flag."""
    from aqualora_tpu.eval import run_dreamsim
    argv = ["--train_folder", artifacts, "--num_prompts", "2",
            "--batch_size", "2", "--tiny"]
    with pytest.raises(SystemExit, match="no DreamSim weights"):
        _run_main(run_dreamsim, argv)
    _run_main(run_dreamsim, argv + ["--allow_random_weights"])
    printed = capsys.readouterr().out
    assert "mean DreamSim distance:" in printed


def test_run_eval_base_reference_two_step_flow(artifacts, tmp_path, capsys):
    """The reference's two-step flow with its own flag spellings:
    create_wm_lora saves a folded file, then
    `run_eval_base --lora <file> --msg_gt <bits> --msgdecoder ... --steps
    --cfg --height/--width --tpr_threshold` (evaluation/run_eval_base.py:
    9-26) produces EXACTLY the one-step --train_folder result."""
    import re

    from aqualora_tpu.eval import run_eval_base
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora

    bits = "10110010"                      # tiny msg_bits = 8
    bitstring, _ = create_watermark_lora(artifacts, scale=1.03, msg_bits=8,
                                         hidinfo=bits, save=True)
    assert bitstring == bits
    folded = os.path.join(artifacts, bits, "pytorch_lora_weights.safetensors")
    assert os.path.exists(folded)

    common = ["--msgdecoder", os.path.join(artifacts, "msgdecoder"),
              "--num_prompts", "2", "--num_seeds", "1",
              "--batch_size", "2", "--tpr_threshold", "1e-2", "--tiny"]
    _run_main(run_eval_base,
              ["--lora", folded, "--msg_gt", bits,
               "--height", "32", "--width", "32",
               "--output_dir", str(tmp_path / "two_step")] + common)
    two = capsys.readouterr().out
    _run_main(run_eval_base,
              ["--train_folder", artifacts, "--hidinfo", bits,
               "--output_dir", str(tmp_path / "one_step")] + common)
    one = capsys.readouterr().out
    acc = lambda s: re.search(r"FINAL bit_accuracy=([\d.]+)", s).group(1)
    assert acc(two) == acc(one)


def test_run_eval_base_flag_validation(artifacts, tmp_path):
    """Guard rails: neither/both lora sources, --lora without --msg_gt,
    non-square --height/--width all fail loudly."""
    import pytest as _pytest

    from aqualora_tpu.eval import run_eval_base
    dec = ["--msgdecoder_path", os.path.join(artifacts, "msgdecoder")]
    with _pytest.raises(SystemExit):
        _run_main(run_eval_base, ["--output_dir", str(tmp_path), "--tiny"]
                  + dec)                       # no lora source
    with _pytest.raises(SystemExit):
        _run_main(run_eval_base,
                  ["--train_folder", artifacts, "--height", "64",
                   "--width", "32", "--tiny",
                   "--output_dir", str(tmp_path)] + dec)  # non-square
    # --lora_scale / --msg_gt are pre-folded-flow flags: silently
    # ignoring them on the train_folder path would make a --lora_scale
    # sweep return bit-identical results
    with _pytest.raises(SystemExit, match="lora_scale"):
        _run_main(run_eval_base,
                  ["--train_folder", artifacts, "--lora_scale", "1.2",
                   "--tiny", "--output_dir", str(tmp_path)] + dec)
    with _pytest.raises(SystemExit, match="msg_gt"):
        _run_main(run_eval_base,
                  ["--train_folder", artifacts, "--msg_gt", "10110010",
                   "--tiny", "--output_dir", str(tmp_path)] + dec)


def test_run_eval_base_lora_without_msg_gt_fails_before_generation(
        artifacts, tmp_path):
    """--lora + --msgdecoder_path but no --msg_gt must abort BEFORE the
    generation pass (the full protocol run is hours on real configs)."""
    import pytest as _pytest

    from aqualora_tpu.eval import run_eval_base
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora
    bits = "01101001"
    create_watermark_lora(artifacts, scale=1.03, msg_bits=8,
                          hidinfo=bits, save=True)
    folded = os.path.join(artifacts, bits,
                          "pytorch_lora_weights.safetensors")
    out = tmp_path / "early_fail"
    with _pytest.raises(SystemExit, match="msg_gt"):
        _run_main(run_eval_base,
                  ["--lora", folded, "--tiny", "--output_dir", str(out),
                   "--num_prompts", "2", "--num_seeds", "1",
                   "--msgdecoder_path",
                   os.path.join(artifacts, "msgdecoder")])
    assert not os.path.isdir(out / "images")   # nothing was generated


def test_run_fid_flag_validation(artifacts, tmp_path):
    """run_fid guard rails: --lora + --train_folder together is
    rejected (silently preferring one would attribute the FID to the
    wrong LoRA), and the missing-Inception-weights guard fires BEFORE
    generation."""
    import json

    import pytest as _pytest

    from aqualora_tpu.eval import run_fid
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps(["a cat", "a dog"]))
    out = str(tmp_path / "fid")
    gen_dir = os.path.join(out, "images")
    with _pytest.raises(SystemExit, match="exactly one"):
        _run_main(run_fid, ["--meta_data", str(meta), "--gt_dir", gen_dir,
                            "--train_folder", artifacts,
                            "--lora", os.path.join(artifacts, "x.st"),
                            "--output_dir", out, "--tiny",
                            "--allow_random_inception"])
    # --lora_scale on the --train_folder path is rejected (the fold is at
    # the reference 1.03; silently ignoring the flag would make a
    # --lora_scale sweep return bit-identical FIDs)
    with _pytest.raises(SystemExit, match="lora_scale"):
        _run_main(run_fid, ["--meta_data", str(meta), "--gt_dir", gen_dir,
                            "--train_folder", artifacts,
                            "--lora_scale", "1.2",
                            "--output_dir", out, "--tiny",
                            "--allow_random_inception"])
    with _pytest.raises(SystemExit, match="no Inception weights"):
        _run_main(run_fid, ["--meta_data", str(meta), "--gt_dir", gen_dir,
                            "--train_folder", artifacts,
                            "--output_dir", out, "--tiny"])
    assert not os.path.isdir(gen_dir)          # guard fired pre-generation


def test_run_dreamsim_weights_guard_fires_before_generation(
        artifacts, monkeypatch):
    """The missing-DreamSim-weights guard must abort BEFORE the two
    generation passes (2xN images at 25 steps on real configs)."""
    import pytest as _pytest

    from aqualora_tpu.eval import run_dreamsim, utils_eval

    def _must_not_generate(*a, **k):
        raise AssertionError("simple_sample ran before the weights guard")

    monkeypatch.setattr(utils_eval, "simple_sample", _must_not_generate)
    with _pytest.raises(SystemExit, match="no DreamSim weights"):
        _run_main(run_dreamsim,
                  ["--train_folder", artifacts, "--num_prompts", "2",
                   "--batch_size", "2", "--tiny"])


def test_run_eval_base_generation_only_writes_result(artifacts, tmp_path):
    """No --msgdecoder_path (reference parity: generate without decoding)
    still leaves the eval_base.json result artifact."""
    import json

    from aqualora_tpu.eval import run_eval_base
    out = tmp_path / "gen_only"
    _run_main(run_eval_base,
              ["--train_folder", artifacts, "--output_dir", str(out),
               "--num_prompts", "2", "--num_seeds", "1",
               "--batch_size", "2", "--tiny"])
    with open(out / "eval_base.json") as f:
        rec = json.load(f)
    assert rec["bit_acc"] is None and rec["n_images"] == 2


def test_resolve_watermark_lora_guards(artifacts, tmp_path):
    """resolve_watermark_lora rejects (a) --hidinfo with a pre-folded
    --lora file (the message is already baked in) and (b) --lora_scale
    on a file whose key layout has no '*up.weight' tensors (the scale
    would silently not apply)."""
    import pytest as _pytest

    from aqualora_tpu.core import io
    from aqualora_tpu.eval import utils_eval
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora

    bits = "11010010"
    create_watermark_lora(artifacts, scale=1.03, msg_bits=8,
                          hidinfo=bits, save=True)
    folded = os.path.join(artifacts, bits,
                          "pytorch_lora_weights.safetensors")
    with _pytest.raises(SystemExit, match="hidinfo"):
        utils_eval.resolve_watermark_lora(None, folded, 1.0, bits, 8,
                                          hidinfo=bits)
    alien = str(tmp_path / "peft_layout.safetensors")
    io.save_safetensors({"x.lora_A.weight": np.zeros((2, 2), np.float32),
                         "x.lora_B.weight": np.zeros((2, 2), np.float32)},
                        alien)
    with _pytest.raises(SystemExit, match="up.weight"):
        utils_eval.resolve_watermark_lora(None, alien, 1.2, bits, 8)
    # scale 1.0 on the same file is fine (no scaling requested)
    _, state = utils_eval.resolve_watermark_lora(None, alien, 1.0, bits, 8)
    assert "x.lora_A.weight" in state


def test_run_demo_tiny_end_to_end(artifacts, tmp_path, capsys):
    """The demo entry (reference run_gradio_demo.py process()) drives
    end to end on --tiny: fold -> DDIM generate -> decode, with the
    blank-secret draw seeded (same --seed => same embedded bits)."""
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_demo", os.path.join(os.path.dirname(__file__), "..",
                                 "run_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    def cli(seed):
        demo.main_cli(argparse.Namespace(
            model_path=None, aqualora_folder=artifacts, secret="",
            prompt="a cat", negative_prompt="", steps=2, cfg=7.5,
            seed=seed, msg_bits=48, msgdecoder_path=None, resolution=512,
            output_dir=str(tmp_path / "demo"), int8=False, tiny=True))
        out = capsys.readouterr().out
        assert "decoded" in out and "saved 1 image(s)" in out
        import re
        return re.search(r"embedded secret: (\d+)", out).group(1)

    assert cli(7) == cli(7)          # blank secret is seed-reproducible
