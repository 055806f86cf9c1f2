"""The golden parity gate runs end to end in CI on synthetic artifacts
(VERDICT: fold -> generate -> decode -> bit-acc + FID smoke, using
torch-constructed random-weight files in the exact reference formats)."""

import importlib.util
import json
import os

import pytest


def _gate():
    spec = importlib.util.spec_from_file_location(
        "golden_gate", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "golden_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_golden_gate_synthetic_tiny_via_merge(tmp_path):
    """--via_merge: fold path AND the README merge workflow (webui layout
    -> merge_lora -> LDM file -> reload) produce matching images."""
    gate = _gate()
    args = gate.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--via_merge", "--out", str(tmp_path),
         "--num_prompts", "1", "--batch_size", "1", "--seed", "1"])
    result = gate.run(args)
    assert result["merge_img_diff"] is not None
    assert result["merge_img_diff"] < 4.0
    assert (tmp_path / "watermark.safetensors").exists()
    assert (tmp_path / "watermark_SDmodel.safetensors").exists()


@pytest.mark.slow
def test_golden_gate_synthetic_tiny_int8(tmp_path):
    """--int8: quantized-serving pass reports image delta + decoded-bit
    agreement vs the bf16 path (the evidence that gates int8 promotion).
    Agreement itself is only asserted well-formed here: random tiny
    weights give near-zero decoder margins, the worst case for bit
    flips; the meaningful number comes from the full-size run."""
    gate = _gate()
    args = gate.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--int8", "--out", str(tmp_path),
         "--num_prompts", "1", "--batch_size", "1", "--seed", "2",
         "--min_int8_agreement", "0"])
    result = gate.run(args)
    rep = result["int8"]
    assert rep["mode"] == "conv"
    assert rep["n_images"] == 1
    assert 0.0 <= rep["decode_agreement_vs_bf16"] <= 1.0
    assert rep["img_diff"] >= 0.0
    # logit-space evidence (the non-vacuous form of the agreement claim
    # for a decoder whose bit margins may never approach zero): the int8
    # margin perturbation, the decision margins it is judged against,
    # and whether the decoder was bit-constant across the image set
    sens = rep["logit_sensitivity"]
    assert sens["int8_margin_delta_max"] >= \
        sens["int8_margin_delta_mean"] >= 0.0
    assert sens["mean_abs_margin"] >= sens["min_abs_margin"] >= 0.0
    assert sens["max_delta_over_min_margin"] >= 0.0
    assert isinstance(sens["release_decoder_bit_constant"], bool)
    # 1 image -> zero cross-image spread by construction
    assert sens["cross_image_spread_mean"] == 0.0
    assert (tmp_path / "images_int8_conv").exists()


@pytest.mark.slow
def test_golden_gate_trained_decoder_leg(tmp_path):
    """--train_decoder_steps: the int8 promotion gate's second agreement
    leg — a briefly stage-1-trained tiny decoder reads both image sets;
    the report carries its agreement + the stage-1 training accuracy.
    (Threshold disabled: 2 steps of training on random tiny weights is
    plumbing coverage, not evidence.)"""
    gate = _gate()
    args = gate.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--int8", "--out", str(tmp_path),
         "--num_prompts", "1", "--batch_size", "1", "--seed", "3",
         "--min_int8_agreement", "0", "--train_decoder_steps", "2"])
    result = gate.run(args)
    rep = result["int8"]["trained_decoder"]
    assert rep["stage1_steps"] == 2
    assert 0.0 <= rep["decode_agreement_vs_bf16"] <= 1.0
    # protocol-exact control: full-res JPEG-q50 (the distortion the
    # protocol demands robustness to), q95 reported for context
    assert 0.0 <= rep["jpeg50_control_agreement"] <= 1.0
    assert 0.0 <= rep["jpeg95_control_agreement"] <= 1.0
    # protocol-relative LOGIT deltas: int8's margin push vs the JPEG-q50
    # control's — the non-saturating form of the agreement comparison
    assert rep["margin_delta_int8"] >= 0.0
    assert rep["margin_delta_jpeg50"] >= 0.0
    assert rep["margin_delta_jpeg95"] >= 0.0
    assert rep["int8_delta_over_jpeg50"] >= 0.0
    assert (tmp_path / "trained_tiny_decoder" / "msgdecoder_only").exists()


def test_golden_gate_train_decoder_requires_int8():
    """--train_decoder_steps without --int8 must fail fast (the leg only
    calibrates the int8 agreement; silently skipping it would let a
    multi-hour gate run come back without the evidence it promised)."""
    gate = _gate()
    args = gate.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--out", "/tmp/x",
         "--train_decoder_steps", "2"])
    with pytest.raises(SystemExit, match="requires --int8"):
        gate.run(args)


def test_golden_gate_model_flag_surface():
    """`--model {sd15,sd21}` selects the full-scale pipeline family
    (GATE_INT8_SD21_r04.json was produced with sd21); the CLI surface and
    its default are pinned here so the recorded evidence stays
    reproducible."""
    gate = _gate()
    p = gate.build_argparser()
    assert p.parse_args(["--out", "/tmp/x"]).model == "sd15"
    assert p.parse_args(["--out", "/tmp/x", "--model", "sd21"]).model == \
        "sd21"
    with pytest.raises(SystemExit):
        p.parse_args(["--out", "/tmp/x", "--model", "sdxl"])


@pytest.mark.slow
def test_golden_gate_synthetic_tiny(tmp_path):
    gate = _gate()
    args = gate.build_argparser().parse_args(
        ["--synthetic", "--tiny", "--out", str(tmp_path),
         "--num_prompts", "2", "--batch_size", "1", "--seed", "0"])
    result = gate.run(args)
    assert result["synthetic"] is True
    assert len(result["message"]) == 48
    assert len(result["decoded"]) == 2 and len(result["decoded"][0]) == 48
    assert 0.0 <= result["bit_acc"] <= 1.0
    with open(tmp_path / "golden_gate.json") as f:
        assert json.load(f)["message"] == result["message"]
    # the synthesized release files are in the exact reference formats
    rel = tmp_path / "reference_release"
    assert (rel / "pretrained_latentwm.pth").exists()
    for f in ("mapper.pt", "msgdecoder.pt",
              "pytorch_lora_weights.safetensors"):
        assert (rel / "ppft_trained" / f).exists()
