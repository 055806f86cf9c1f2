"""Real-weight parity runbook: ONE command from checkpoint paths to
PARITY.json (VERDICT r3 "Missing #1" — fires the moment the published
AquaLoRA release artifacts are reachable).

Given an SD-1.5 checkpoint and the reference release files
(`README.md:46-51`: pretrained_latentwm.pth + ppft_trained/{
pytorch_lora_weights.safetensors, mapper.pt, msgdecoder.pt}), chains the
full acceptance protocol:

  1. port + golden gate  (scripts/golden_gate.py: fold -> generate ->
     decode, --via_merge merged-LDM certification, --int8 conv
     agreement leg; bit accuracy >= --min_bit_acc asserted)
  2. run_eval_base       (reference evaluation/run_eval_base.py:15-54
     protocol: N prompts x num_seeds, DPM-Solver++ 25, CFG 7.5, 512^2,
     FPR 1e-6)
  3. run_fid             (reference evaluation/run_fid.py:38-70
     protocol; only when --fid_meta/--fid_gt_dir and Inception weights
     are supplied)
  -> <out>/PARITY.json with every leg's numbers.

North-star acceptance (SURVEY.md): bit accuracy >= 0.99 and FID within
1% of the reference's published setup.  With --synthetic the whole
chain runs on fabricated random-weight artifacts (CI plumbing;
accuracies reported, not asserted).

Usage (real weights):
  python scripts/run_parity.py --out parity_out \
      --sd_model v1-5-pruned-emaonly.safetensors \
      --latentwm pretrained_latentwm.pth --train_folder ppft_trained \
      [--fid_meta meta_data.json --fid_gt_dir coco_gt/ \
       --inception_torch_weights pt_inception-2015-12-05.pth]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--sd_model", type=str, default=None)
    p.add_argument("--latentwm", type=str, default=None)
    p.add_argument("--train_folder", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="CI plumbing mode: fabricate reference-format "
                        "artifacts first; accuracies reported, not "
                        "asserted")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (CI scale)")
    p.add_argument("--min_bit_acc", type=float, default=0.99)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--rank", type=int, default=320)
    p.add_argument("--sampler", type=str, default="dpms_m")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--gate_num_prompts", type=int, default=16)
    p.add_argument("--skip_merge", action="store_true",
                   help="skip the gate's merged-LDM certification leg")
    p.add_argument("--skip_int8", action="store_true",
                   help="skip the gate's int8-conv agreement leg")
    p.add_argument("--eval_num_prompts", type=int, default=100)
    p.add_argument("--eval_num_seeds", type=int, default=10)
    p.add_argument("--fid_meta", type=str, default=None,
                   help="COCO meta_data.json / metadata.jsonl captions")
    p.add_argument("--fid_gt_dir", type=str, default=None,
                   help="ground-truth image dir or precomputed .npz stats")
    p.add_argument("--fid_num_images", type=int, default=5000)
    p.add_argument("--inception_torch_weights", type=str, default=None,
                   help="pt_inception-2015-12-05 checkpoint for real FID")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "golden_gate", os.path.join(_ROOT, "scripts", "golden_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(module, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        return module.main()
    finally:
        sys.argv = old


def run(args) -> dict:
    if bool(args.fid_meta) != bool(args.fid_gt_dir):
        # fail BEFORE the hours-long gate/eval legs: a parity run must
        # not come back with fid: null because one of the pair was
        # forgotten
        raise SystemExit("--fid_meta and --fid_gt_dir must be given "
                         "together (the FID leg needs captions AND the "
                         "ground-truth images/stats)")
    os.makedirs(args.out, exist_ok=True)
    # read the tiny bit count from the config so the gate leg and the
    # eval runners' --tiny configs can never drift apart
    from aqualora_tpu.core.config import WatermarkConfig
    tiny_bits = WatermarkConfig.tiny().msg_bits

    # --- leg 1+2: port + golden gate (fold / merge / int8 evidence) ----
    gate = _load_gate()
    gate_out = os.path.join(args.out, "gate")
    gate_argv = ["--out", gate_out, "--seed", str(args.seed),
                 "--sampler", args.sampler,
                 "--num_prompts", str(args.gate_num_prompts),
                 "--batch_size", str(args.batch_size),
                 "--min_bit_acc", str(args.min_bit_acc),
                 "--msg_bits", str(tiny_bits if args.tiny
                                   else args.msg_bits),
                 "--rank", str(args.rank)]
    if args.sd_model:
        gate_argv += ["--sd_model", args.sd_model]
    if args.latentwm:
        gate_argv += ["--latentwm", args.latentwm]
    if args.train_folder:
        gate_argv += ["--train_folder", args.train_folder]
    if args.synthetic:
        gate_argv += ["--synthetic"]
    if args.tiny:
        gate_argv += ["--tiny"]
    if not args.skip_merge:
        gate_argv += ["--via_merge"]
    if not args.skip_int8:
        gate_argv += ["--int8", "conv"]
        if args.synthetic:
            # random tiny weights sit at near-zero decoder margins — the
            # agreement threshold is evidence only at real/full scale
            gate_argv += ["--min_int8_agreement", "0"]
    gate_result = gate.run(gate.build_argparser().parse_args(gate_argv))
    ported = os.path.join(gate_out, "ported")

    # --- leg 3: run_eval_base (TPR/bit-acc benchmark protocol) ---------
    from aqualora_tpu.eval import run_eval_base
    eval_argv = ["--train_folder", ported,
                 "--msgdecoder_path", os.path.join(ported, "msgdecoder"),
                 "--output_dir", os.path.join(args.out, "eval_base"),
                 "--sampler", args.sampler,
                 "--batch_size", str(args.batch_size),
                 "--num_prompts", str(args.eval_num_prompts),
                 "--num_seeds", str(args.eval_num_seeds),
                 "--msg_bits", str(args.msg_bits)]
    if args.sd_model:
        eval_argv += ["--model_path", args.sd_model]
    if args.tiny:
        eval_argv += ["--tiny"]
    eval_result = _run_main(run_eval_base, eval_argv)

    # --- leg 4: run_fid (optional — needs captions + GT + Inception) ---
    fid_result = None
    if args.fid_meta and args.fid_gt_dir:
        from aqualora_tpu.eval import run_fid
        fid_argv = ["--train_folder", ported,
                    "--meta_data", args.fid_meta,
                    "--gt_dir", args.fid_gt_dir,
                    "--output_dir", os.path.join(args.out, "fid"),
                    "--num_images", str(args.fid_num_images),
                    "--sampler", args.sampler,
                    "--batch_size", str(args.batch_size),
                    "--msg_bits", str(args.msg_bits)]
        if args.sd_model:
            fid_argv += ["--model_path", args.sd_model]
        if args.inception_torch_weights:
            fid_argv += ["--inception_torch_weights",
                         args.inception_torch_weights]
        elif args.synthetic or args.tiny:
            fid_argv += ["--allow_random_inception"]
        if args.tiny:
            fid_argv += ["--tiny"]
        fid_result = _run_main(run_fid, fid_argv)

    parity = {"synthetic": bool(args.synthetic),
              "sd_model": args.sd_model,
              "gate": gate_result, "eval_base": eval_result,
              "fid": fid_result}
    path = os.path.join(args.out, "PARITY.json")
    with open(path, "w") as f:
        json.dump(parity, f, indent=1)
    print(f"wrote {path}")
    if not args.synthetic:
        acc = eval_result["bit_acc"]
        assert acc >= args.min_bit_acc, (
            f"run_eval_base bit accuracy {acc:.4f} < {args.min_bit_acc} "
            f"— REAL-WEIGHT PARITY FAILED")
        print(f"REAL-WEIGHT PARITY PASSED (bit_acc={acc:.4f}, "
              f"tpr={eval_result['tpr']:.4f})")
    else:
        print("plumbing parity chain passed (synthetic weights: "
              "accuracies reported, not asserted)")
    return parity


if __name__ == "__main__":
    run(build_argparser().parse_args())
