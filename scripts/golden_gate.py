"""Golden parity gate: one command that proves the cross-ecosystem
artifact protocol end to end.

Given SD-1.5 weights and the reference release artifacts
(`README.md:46-51`: pretrained_latentwm.pth + ppft_trained/{lora,mapper.pt,
msgdecoder.pt}), this runs the reference's serving path
(`run_gradio_demo.py:10-29` / `evaluation/run_eval_base.py`):

  port -> create_wm_lora fold -> generate (DPM-Solver++ 25) -> decode
  -> bit accuracy + TPR(tau from FPR)  [+ FID-protocol smoke]

and asserts bit accuracy >= --min_bit_acc (0.99).  With --synthetic it
first fabricates random-weight artifacts in the exact reference file
formats (tools/synthetic_artifacts.py), so the whole gate runs in CI
before the published checkpoints are available; accuracy is then reported
but not asserted (random weights carry no signal).

Examples:
  python scripts/golden_gate.py --synthetic --tiny --out /tmp/gate
  python scripts/golden_gate.py --sd_model sd15.safetensors \
      --latentwm pretrained_latentwm.pth --train_folder ppft_trained \
      --out gate_out --min_bit_acc 0.99
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--sd_model", type=str, default=None,
                   help="SD checkpoint; random-init pipeline when absent")
    p.add_argument("--latentwm", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="fabricate reference-format artifacts first")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (CI scale)")
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--rank", type=int, default=320)
    p.add_argument("--hidinfo", type=str, default=None)
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--num_prompts", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--fpr", type=float, default=1e-6)
    p.add_argument("--min_bit_acc", type=float, default=0.99,
                   help="asserted unless --synthetic")
    p.add_argument("--seed", type=int, default=0)
    return p


def run(args) -> dict:
    from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
    from aqualora_tpu.eval import fid as fid_mod
    from aqualora_tpu.eval.prompts import load_prompts
    from aqualora_tpu.eval.utils_eval import simple_decode, simple_sample
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora
    from aqualora_tpu.tools.port_reference_artifacts import port

    if args.tiny:
        cfg = PipelineConfig.tiny()
        backbone = EfficientNetConfig.tiny(num_classes=args.msg_bits * 2)
        args.resolution = min(args.resolution, 64)
        args.num_inference_steps = min(args.num_inference_steps, 4)
    else:
        cfg = PipelineConfig.sd15(lora_rank=args.rank)
        backbone = EfficientNetConfig.b1(num_classes=args.msg_bits * 2)
    if cfg.watermark.msg_bits != args.msg_bits:
        from dataclasses import replace
        cfg = replace(cfg, watermark=replace(cfg.watermark,
                                             msg_bits=args.msg_bits))

    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        from aqualora_tpu.tools.synthetic_artifacts import (
            synthesize_reference_artifacts)
        synth_dir = os.path.join(args.out, "reference_release")
        synthesize_reference_artifacts(
            synth_dir, msg_bits=args.msg_bits,
            rank=cfg.unet.lora.rank if args.tiny else args.rank,
            unet=cfg.unet, backbone=backbone, seed=args.seed)
        args.latentwm = os.path.join(synth_dir, "pretrained_latentwm.pth")
        args.train_folder = os.path.join(synth_dir, "ppft_trained")
        print(f"synthesized reference-format artifacts in {synth_dir}")

    ported = os.path.join(args.out, "ported")
    port(ported, latentwm=args.latentwm, train_folder=args.train_folder,
         backbone=backbone)

    # fold the message (demo path, run_gradio_demo.py:16-19)
    bitstring, lora = create_watermark_lora(
        ported, scale=1.03, msg_bits=args.msg_bits, hidinfo=args.hidinfo,
        save=False, rng=np.random.default_rng(args.seed))
    print(f"message: {bitstring} ({len(lora)} folded tensors)")

    prompts = load_prompts(None, args.num_prompts)
    img_dir = os.path.join(args.out, "images")
    images = simple_sample(
        args.sd_model, args.sampler, prompts, lora=lora, seeds=[args.seed],
        output_dir=img_dir, config=cfg,
        num_inference_steps=args.num_inference_steps,
        batch_size=args.batch_size, resolution=args.resolution)
    print(f"generated {len(images)} images at {args.resolution}^2")

    bit_acc, tpr, decoded = simple_decode(
        args.msg_bits, os.path.join(ported, "msgdecoder"), images,
        msg_gt=bitstring, resolution=backbone.decoder_resolution,
        tpr_threshold=args.fpr, backbone=backbone)
    print(f"bit accuracy: {bit_acc:.4f}  TPR@FPR{args.fpr:g}: {tpr:.4f}")

    # FID-protocol smoke: pool3 stats over the generated set (random-init
    # Inception unless ported weights are wired in run_fid)
    fid_self = None
    if len(images) >= 2:      # covariance needs >= 2 observations
        arr = np.stack([np.asarray(im, np.float32) / 255.0
                        for im in images])
        feats = fid_mod.InceptionExtractor()(arr)
        mu, sigma = fid_mod.activation_statistics(feats)
        fid_self = fid_mod.frechet_distance(mu, sigma, mu, sigma)
        assert abs(fid_self) < 1e-3, "FID protocol self-distance must be ~0"
        print(f"FID protocol smoke: self-distance {fid_self:.2e} OK")

    result = {"bit_acc": float(bit_acc), "tpr": float(tpr),
              "message": bitstring, "decoded": decoded,
              "synthetic": bool(args.synthetic)}
    with open(os.path.join(args.out, "golden_gate.json"), "w") as f:
        json.dump(result, f, indent=1)
    if not args.synthetic:
        assert bit_acc >= args.min_bit_acc, (
            f"bit accuracy {bit_acc:.4f} < {args.min_bit_acc} — "
            f"parity gate FAILED")
        print("GOLDEN GATE PASSED")
    else:
        print("plumbing gate passed (synthetic weights: accuracy "
              "reported, not asserted)")
    return result


if __name__ == "__main__":
    run(build_argparser().parse_args())
