"""FID benchmark (`evaluation/run_fid.py`, Tree-Ring protocol).

Generate N images (default 5000) from COCO-caption metadata with the
watermark LoRA active (50 steps, cfg 7.5, 512x512, `run_fid.py:78-85`),
then FID vs the ground-truth image directory (`:66-70`).
"""

from __future__ import annotations

import argparse
import json
import glob
import os

import numpy as np

from aqualora_tpu.eval import utils_eval
from aqualora_tpu.eval.fid import fid_given_paths


def load_captions(meta_path: str, n: int, start: int = 0):
    """COCO meta_data.json captions (`run_fid.py:29-33`: a dict with
    'annotations' rows carrying 'caption') or metadata.jsonl."""
    caps = []
    if meta_path.endswith(".jsonl"):
        with open(meta_path) as f:
            for line in f:
                caps.append(json.loads(line).get("text", ""))
    else:
        with open(meta_path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            # the reference's COCO format: {'images': [...],
            # 'annotations': [{'caption': ...}, ...]}
            data = data.get("annotations", list(data.values()))
        for row in data:
            caps.append(row if isinstance(row, str)
                        else row.get("caption", row.get("text", "")))
    return caps[start:start + n]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag names (evaluation/run_fid.py:76-96) accepted as
    # aliases: --model_id, --gt_folder, --prompt_file, --image_length,
    # --start/--end caption slicing, --gen_seed, --lora (a folder or
    # file holding the folded pytorch_lora_weights.safetensors)
    p.add_argument("--model_path", "--model_id", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None,
                   help="watermark LoRA folder (omit for clean baseline)")
    p.add_argument("--lora", type=str, default=None,
                   help="pre-folded LoRA safetensors file or the folder "
                        "holding pytorch_lora_weights.safetensors "
                        "(reference two-step flow)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--meta_data", "--prompt_file", type=str, required=True)
    p.add_argument("--gt_dir", "--gt_folder", type=str, required=True,
                   help="ground-truth image dir (or precomputed .npz stats)")
    p.add_argument("--output_dir", type=str, default="fid_out")
    p.add_argument("--num_images", type=int, default=5000)
    p.add_argument("--start", type=int, default=0,
                   help="first caption index (reference --start)")
    p.add_argument("--end", type=int, default=None,
                   help="exclusive end caption index (overrides "
                        "--num_images, reference --end)")
    p.add_argument("--gen_seed", type=int, default=0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--resolution", "--image_length", type=int,
                   default=512)
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--inception_params", type=str, default=None,
                   help="orbax pytree of ported FID Inception weights")
    p.add_argument("--inception_torch_weights", type=str, default=None,
                   help="torch FID InceptionV3 checkpoint "
                        "(pt_inception-2015-12-05 layout, "
                        "pytorch_fid/inception.py:16) imported directly")
    p.add_argument("--allow_random_inception", action="store_true",
                   help="permit a randomly initialized Inception (smoke "
                        "tests only — the FID is meaningless)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CI/smoke)")
    p.add_argument("--int8", nargs="?", const="conv", default=False,
                   choices=("conv", "dense", "all", "vae", "conv+vae",
                            "dense+vae", "all+vae"),
                   help="generate with int8 serving (ops/quant.py; bare "
                        "--int8 = conv-only). Default bf16 = the "
                        "reference protocol "
                        "(docs/EVALUATION.md 'int8 vs protocol')")
    args = p.parse_args()

    cfg = None
    if args.tiny:
        from aqualora_tpu.core.config import PipelineConfig
        cfg = PipelineConfig.tiny()
        args.msg_bits = cfg.watermark.msg_bits
        args.resolution = 32
        args.num_inference_steps = min(args.num_inference_steps, 2)
    n = (args.end - args.start if args.end is not None
         else args.num_images)
    captions = load_captions(args.meta_data, n, start=args.start)

    # resolve the Inception extractor BEFORE the (hours-long) generation
    # pass: a missing-weights SystemExit after 5000 images at 50 steps
    # would throw the whole run away
    extractor = None
    if args.inception_torch_weights:
        from aqualora_tpu.eval.fid import InceptionExtractor
        from aqualora_tpu.tools.torch_import import inception_from_torch
        extractor = InceptionExtractor(
            inception_from_torch(args.inception_torch_weights))
    elif args.inception_params:
        from aqualora_tpu.core.checkpoint import load_pytree
        from aqualora_tpu.eval.fid import InceptionExtractor
        extractor = InceptionExtractor(load_pytree(args.inception_params))
    elif not args.allow_random_inception:
        # a random-init Inception prints a plausible but meaningless FID
        # (same guard as the python -m aqualora_tpu.eval.fid CLI)
        raise SystemExit(
            "no Inception weights: pass --inception_torch_weights or "
            "--inception_params (or --allow_random_inception for a smoke "
            "run whose FID is meaningless)")

    lora = None
    if args.lora or args.train_folder:
        # route BOTH flows through resolve_watermark_lora so its guards
        # apply here too: exactly one source, and --lora_scale rejected
        # on the --train_folder path (which folds at the reference 1.03)
        # instead of being silently ignored
        path = args.lora
        if path and os.path.isdir(path):
            path = os.path.join(path, "pytorch_lora_weights.safetensors")
        bitstring, lora = utils_eval.resolve_watermark_lora(
            args.train_folder, path, args.lora_scale, None, args.msg_bits,
            rng=np.random.default_rng(0))
        if bitstring is not None:
            print(f"message: {bitstring}")

    gen_dir = os.path.join(args.output_dir, "images")
    if os.path.isdir(gen_dir):
        # stale PNGs from a previous run (different message/prompt
        # count) would silently corrupt the decode/FID set
        for f in glob.glob(os.path.join(gen_dir, "*.png")):
            os.remove(f)
    utils_eval.simple_sample(
        args.model_path, args.sampler, captions, lora=lora,
        seeds=[args.gen_seed],
        output_dir=gen_dir, num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, batch_size=args.batch_size,
        resolution=args.resolution, config=cfg, int8=args.int8)

    fid = fid_given_paths(gen_dir, args.gt_dir, extractor=extractor)
    print(f"FID: {fid:.4f}")
    result = {"fid": float(fid), "n_images": len(captions),
              "random_inception": bool(args.allow_random_inception
                                       and not args.inception_params
                                       and not args.inception_torch_weights),
              "int8": args.int8 or None}
    with open(os.path.join(args.output_dir, "fid.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
