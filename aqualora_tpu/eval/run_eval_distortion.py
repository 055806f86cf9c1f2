"""Robustness benchmark (`evaluation/run_eval_distortion.py`).

Generate watermarked images once, apply each of the 7+ distortions
(color_jitter, crop, blur, noise, jpeg_compress, rotation, sharpness,
SDEdit[, SDEdit2], `run_eval_distortion.py:57`), decode per distortion
directory, report per-distortion bit accuracy + TPR.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import numpy as np

from aqualora_tpu.eval import distortions as dist
from aqualora_tpu.eval import utils_eval
from aqualora_tpu.eval.prompts import load_prompts


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag names (evaluation/run_eval_distortion.py) accepted
    # as aliases, incl. the two-step folded-LoRA flow
    p.add_argument("--model_path", "--model", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="pre-folded LoRA safetensors (reference two-step "
                        "flow); pass the embedded bits via --msg_gt")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--msg_gt", type=str, default=None)
    p.add_argument("--msgdecoder_path", "--msgdecoder", type=str,
                   required=True)
    p.add_argument("--output_dir", type=str, default="eval_dist_out")
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--num_inference_steps", "--steps", type=int,
                   default=25)
    p.add_argument("--guidance_scale", "--cfg", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--fpr", "--tpr_threshold", type=float, default=1e-6)
    p.add_argument("--num_prompts", type=int, default=100)
    p.add_argument("--prompt_file", "--prompt_path", type=str,
                   default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CI/smoke)")
    p.add_argument("--int8", nargs="?", const="conv", default=False,
                   choices=("conv", "dense", "all", "vae", "conv+vae",
                            "dense+vae", "all+vae"),
                   help="generate the clean set with int8 serving "
                        "(ops/quant.py; bare --int8 = conv-only). Default "
                        "bf16 = the reference protocol "
                        "(docs/EVALUATION.md 'int8 vs protocol')")
    p.add_argument("--distortions", type=str,
                   default="color_jitter,crop,blur,noise,jpeg_compress,"
                           "rotation,sharpness")
    p.add_argument("--with_sdedit", action="store_true",
                   help="include the SDEdit regeneration attack (needs "
                        "the SD pipeline on device)")
    p.add_argument("--with_sdedit2", action="store_true",
                   help="include SDEdit2 (SD-2.1 img2img at strength 0.2, "
                        "utils_eval.py:244-262)")
    p.add_argument("--sd2_model_path", type=str, default=None,
                   help="SD-2.1 diffusers checkpoint dir for SDEdit2")
    args = p.parse_args()

    cfg = backbone = None
    if args.tiny:
        from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
        cfg, backbone = PipelineConfig.tiny(), EfficientNetConfig.tiny()
        args.msg_bits = cfg.watermark.msg_bits
        args.resolution = 32
        args.num_inference_steps = min(args.num_inference_steps, 2)
    utils_eval.square_resolution(args)
    prompts = load_prompts(args.prompt_file, args.num_prompts)
    bitstring, lora = utils_eval.resolve_watermark_lora(
        args.train_folder, args.lora, args.lora_scale, args.msg_gt,
        args.msg_bits)
    if bitstring is None:
        raise SystemExit("--lora given without --msg_gt: cannot score "
                         "decodes against unknown bits")
    print(f"message: {bitstring}")

    gen_dir = os.path.join(args.output_dir, "clean")
    if os.path.isdir(gen_dir):
        # stale PNGs from a previous run (different message/prompt
        # count) would silently corrupt every distortion's decode set
        for f in glob.glob(os.path.join(gen_dir, "*.png")):
            os.remove(f)
    utils_eval.simple_sample(
        args.model_path, args.sampler, prompts, lora=lora, seeds=[0],
        output_dir=gen_dir, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        batch_size=args.batch_size, resolution=args.resolution,
        config=cfg, int8=args.int8)

    from PIL import Image
    paths = sorted(glob.glob(os.path.join(gen_dir, "*.png")))
    imgs01 = np.stack([np.asarray(Image.open(p), np.uint8)
                       for p in paths]).astype(np.float32) / 255.0

    kinds = args.distortions.split(",")
    sdedit = sdedit2 = None
    if args.with_sdedit or args.with_sdedit2:
        from aqualora_tpu.core.config import PipelineConfig
        from aqualora_tpu.core.tokenizer import load_tokenizer
        from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
        from aqualora_tpu.train.ppft_train import _load_sd_checkpoint
        tok = load_tokenizer(None)
    def _attack_params(pipe, seed):
        # host-side numpy init (no minutes-long flax init trace); real
        # checkpoints overwrite these leaves anyway, and SDEditAttack
        # device_puts the tree once
        p = pipe.fast_init_params(seed, args.resolution, args.resolution)
        return jax.tree_util.tree_map(
            lambda x: x.astype(np.float32)
            if getattr(x, "dtype", None) == np.float64 else x, p)

    if args.with_sdedit:
        kinds += ["SDEdit"]
        # --tiny drives the attack with the tiny pipeline too: building
        # full SD-1.5 under the smoke flag would defeat its purpose
        pipe = StableDiffusionPipeline(cfg or PipelineConfig.sd15(None))
        p = _attack_params(pipe, 0)
        if args.model_path:
            p = _load_sd_checkpoint(args.model_path, p)
        sdedit = dist.SDEditAttack(pipe, p, tok, version=1,
                                   resolution=args.resolution,
                                   batch_size=args.batch_size)
    if args.with_sdedit2:
        kinds += ["SDEdit2"]
        pipe2 = StableDiffusionPipeline(cfg or PipelineConfig.sd21(None))
        p2 = _attack_params(pipe2, 1)
        if args.sd2_model_path:
            p2 = _load_sd_checkpoint(args.sd2_model_path, p2)
        sdedit2 = dist.SDEditAttack(pipe2, p2, tok, version=2,
                                    resolution=args.resolution,
                                    batch_size=args.batch_size)
    results = {}
    key = jax.random.PRNGKey(0)
    for kind in kinds:
        out_dir = os.path.join(args.output_dir, kind)
        os.makedirs(out_dir, exist_ok=True)
        key, sub = jax.random.split(key)
        distorted = dist.distortion_unit(imgs01, kind, sub, sdedit=sdedit,
                                         sdedit2=sdedit2)
        # ROUND like the clean set's save path (utils_eval._to_uint8_device
        # / diffusers numpy_to_pil): truncation would darken every
        # distorted pixel by up to 1 LSB relative to the clean protocol
        pil = [np.round(d * 255).clip(0, 255).astype(np.uint8)
               for d in distorted]
        outs = []
        for p_, d in zip(paths, pil):
            o = os.path.join(out_dir, os.path.basename(p_))
            Image.fromarray(d).save(o)
            outs.append(o)
        bitacc, tpr, _ = utils_eval.simple_decode(
            args.msg_bits, args.msgdecoder_path, outs, msg_gt=bitstring,
            tpr_threshold=args.fpr, backbone=backbone,
            resolution=args.resolution)
        results[kind] = (bitacc, tpr)
        print(f"{kind}: bit_accuracy={bitacc:.4f} TPR={tpr:.4f}")

    print("SUMMARY:", {k: (round(a, 4), round(t, 4))
                       for k, (a, t) in results.items()})


if __name__ == "__main__":
    main()
