"""TPR / bit-accuracy benchmark (`evaluation/run_eval_base.py`).

Protocol: 100 prompts x 10 seed-sets, DPM-Solver++ (dpms_m) 25 steps,
CFG 7.5, 512x512, FPR 1e-6 (`run_eval_base.py:15-54`); generate with a
message-folded watermark LoRA, then decode every PNG and report bit
accuracy + TPR.
"""

from __future__ import annotations

import argparse
import glob
import os

from aqualora_tpu.eval import utils_eval
from aqualora_tpu.eval.prompts import load_prompts


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag names (run_eval_base.py:9-26) accepted as aliases,
    # incl. the two-step folded-LoRA flow (--lora + --lora_scale +
    # --msg_gt after scripts/create_wm_lora.py)
    p.add_argument("--model_path", "--model", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="pre-folded LoRA safetensors (reference two-step "
                        "flow); pass the embedded bits via --msg_gt")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--msg_gt", type=str, default=None)
    p.add_argument("--msgdecoder_path", "--msgdecoder", type=str,
                   default=None,
                   help="omit to generate images without decoding "
                        "(reference behavior when --msgdecoder is unset)")
    p.add_argument("--output_dir", type=str, default="eval_out")
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--num_inference_steps", "--steps", type=int,
                   default=25)
    p.add_argument("--guidance_scale", "--cfg", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--fpr", "--tpr_threshold", type=float, default=1e-6)
    p.add_argument("--num_seeds", type=int, default=10)
    p.add_argument("--num_prompts", type=int, default=100)
    p.add_argument("--prompt_file", "--prompt_path", type=str,
                   default=None)
    p.add_argument("--hidinfo", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CI/smoke)")
    p.add_argument("--int8", nargs="?", const="conv", default=False,
                   choices=("conv", "dense", "all", "vae", "conv+vae",
                            "dense+vae", "all+vae"),
                   help="generate with int8 serving (ops/quant.py; bare "
                        "--int8 = conv-only, the gate-validated config). "
                        "Default bf16 = the reference protocol "
                        "(docs/EVALUATION.md 'int8 vs protocol')")
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
        args.msg_bits, hidinfo=args.hidinfo)
    if args.msgdecoder_path is not None and bitstring is None:
        # fail BEFORE the (hours-long) generation pass, not after it
        raise SystemExit("--lora given without --msg_gt: cannot score "
                         "decodes against unknown bits")
    print(f"message: {bitstring}")

    gen_dir = os.path.join(args.output_dir, "images")
    if os.path.isdir(gen_dir):
        # stale PNGs from a previous run (different message/prompt
        # count) would silently corrupt the decode/FID set
        for f in glob.glob(os.path.join(gen_dir, "*.png")):
            os.remove(f)
    # all seed-sets in one call: the pipeline/params/compile are built once
    utils_eval.simple_sample(
        args.model_path, args.sampler, prompts, lora=lora,
        seeds=list(range(args.num_seeds)), output_dir=gen_dir,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        batch_size=args.batch_size, resolution=args.resolution,
        config=cfg, int8=args.int8)

    import json
    images = sorted(glob.glob(os.path.join(gen_dir, "*.png")))
    if args.msgdecoder_path is None:
        print(f"generated {len(images)} images (no --msgdecoder_path: "
              "decode skipped, reference parity)")
        result = {"bit_acc": None, "tpr": None, "n_images": len(images),
                  "message": bitstring, "sampler": args.sampler,
                  "int8": args.int8 or None}
        # still leave the result artifact: a generation-only run is hours
        # of TPU time and downstream tooling reads eval_base.json
        with open(os.path.join(args.output_dir, "eval_base.json"),
                  "w") as f:
            json.dump(result, f, indent=1)
        return result
    bitacc, tpr, _ = utils_eval.simple_decode(
        args.msg_bits, args.msgdecoder_path, images, msg_gt=bitstring,
        tpr_threshold=args.fpr, backbone=backbone,
        resolution=args.resolution)
    print(f"FINAL bit_accuracy={bitacc:.4f} TPR={tpr:.4f} "
          f"({len(images)} images)")
    result = {"bit_acc": float(bitacc), "tpr": float(tpr),
              "n_images": len(images), "message": bitstring,
              "sampler": args.sampler, "fpr": args.fpr,
              "int8": args.int8 or None}
    with open(os.path.join(args.output_dir, "eval_base.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
