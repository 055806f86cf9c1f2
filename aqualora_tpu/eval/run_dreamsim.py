"""Perceptual fidelity benchmark (`evaluation/run_dreamsim.py`).

Paired generation with and without the watermark LoRA at identical seeds
(`run_dreamsim.py:49-79`), mean DreamSim distance over the pairs (`ds:11-22`).
"""

from __future__ import annotations

import argparse

import numpy as np

from aqualora_tpu.eval import utils_eval
from aqualora_tpu.eval.dreamsim import DreamSim
from aqualora_tpu.eval.prompts import load_prompts


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag names (evaluation/run_dreamsim.py) accepted as
    # aliases, incl. the two-step folded-LoRA flow (--lora file)
    p.add_argument("--model_path", "--model", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="pre-folded LoRA safetensors (reference two-step "
                        "flow)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--num_prompts", type=int, default=100)
    p.add_argument("--prompt_file", "--prompt_path", type=str,
                   default=None)
    p.add_argument("--guidance_scale", "--cfg", type=float, default=7.5)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--num_inference_steps", "--steps", type=int,
                   default=25)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--dreamsim_params", type=str, default=None,
                   help="orbax pytree of ported backbone weights")
    p.add_argument("--dreamsim_cache_dir", type=str, default=None,
                   help="unzipped reference DreamSim checkpoint dir "
                        "(dreamsim/model.py:160-191) imported directly")
    p.add_argument("--dreamsim_type", type=str, default="ensemble",
                   choices=["ensemble", "dino_vitb16", "clip_vitb32",
                            "open_clip_vitb32", "mae_vitb16", "mae_vitl16",
                            "mae_vith14"])
    p.add_argument("--allow_random_weights", action="store_true",
                   help="permit a randomly initialized DreamSim ensemble "
                        "(smoke tests only — the distance is meaningless)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CI/smoke)")
    p.add_argument("--int8", nargs="?", const="conv", default=False,
                   choices=("conv", "dense", "all", "vae", "conv+vae",
                            "dense+vae", "all+vae"),
                   help="generate BOTH image sets with int8 serving "
                        "(ops/quant.py; bare --int8 = conv-only). Default "
                        "bf16 = the reference protocol "
                        "(docs/EVALUATION.md 'int8 vs protocol')")
    args = p.parse_args()

    cfg = vit_overrides = None
    if args.tiny:
        from aqualora_tpu.core.config import PipelineConfig
        cfg = PipelineConfig.tiny()
        args.msg_bits = cfg.watermark.msg_bits
        args.resolution = 32
        args.num_inference_steps = min(args.num_inference_steps, 2)
        vit_overrides = {"dim": 32, "depth": 1, "heads": 2}
    prompts = load_prompts(args.prompt_file, args.num_prompts)
    utils_eval.square_resolution(args)
    bitstring, lora = utils_eval.resolve_watermark_lora(
        args.train_folder, args.lora, args.lora_scale, None,
        args.msg_bits)
    print(f"message: {bitstring}")

    # resolve the DreamSim weights BEFORE the (hours-long) paired
    # generation passes: a missing-weights SystemExit after 2xN images at
    # 25 steps would throw the whole run away (same fail-fast rule as
    # run_fid's Inception guard)
    params = None
    if args.dreamsim_cache_dir:
        from aqualora_tpu.tools.torch_import import dreamsim_from_torch
        params = dreamsim_from_torch(args.dreamsim_cache_dir,
                                     args.dreamsim_type)
    elif args.dreamsim_params:
        from aqualora_tpu.core.checkpoint import load_pytree
        params = load_pytree(args.dreamsim_params)
    elif not args.allow_random_weights:
        # a random-init ensemble prints a plausible but meaningless
        # distance for the fidelity benchmark (same guard class as the
        # FID entry points)
        raise SystemExit(
            "no DreamSim weights: pass --dreamsim_cache_dir or "
            "--dreamsim_params (or --allow_random_weights for a smoke "
            "run whose distance is meaningless)")

    common = dict(seeds=[0], num_inference_steps=args.num_inference_steps,
                  guidance_scale=args.guidance_scale,
                  batch_size=args.batch_size, resolution=args.resolution,
                  config=cfg, int8=args.int8)
    imgs_wm = utils_eval.simple_sample(args.model_path, args.sampler,
                                       prompts, lora=lora, **common)
    imgs_clean = utils_eval.simple_sample(args.model_path, args.sampler,
                                          prompts, lora=None, **common)

    ds = DreamSim(params=params, dreamsim_type=args.dreamsim_type,
                  vit_overrides=vit_overrides)
    a = np.stack([np.asarray(i, np.float32) / 255.0 for i in imgs_wm])
    b = np.stack([np.asarray(i, np.float32) / 255.0 for i in imgs_clean])
    dists = []
    for i in range(0, len(a), args.batch_size):
        dists.append(ds(a[i:i + args.batch_size], b[i:i + args.batch_size]))
    print(f"mean DreamSim distance: {float(np.concatenate(dists).mean()):.6f}")


if __name__ == "__main__":
    main()
