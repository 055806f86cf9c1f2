"""Stage-3 `--int8_gen` <-> serving-dtype transfer evidence (VERDICT r4 #5).

Stage 3 hardens the message decoder on images GENERATED inside its loop
(reference `train/rob_enhance_finetune.py:1004-1035`); our `--int8_gen`
runs that generation with the promoted int8-conv serving kernels (+4.4%
measured).  The open question this records: does a decoder hardened on
one generation dtype still read the OTHER dtype's images — i.e. may a
deployment mix `--int8_gen` training with bf16 serving (or vice versa)?

Protocol (tiny scale, CPU — same epistemics as the golden gate's
trained-decoder leg):
  1. train TWO stage-3 tiny decoders with IDENTICAL seed/data/messages,
     differing only in --int8_gen;
  2. generate a fresh eval set twice from the same pipeline state —
     bf16 and int8-conv kernels, same keys/messages;
  3. decode both sets through both decoders; the yardstick for "small"
     is each decoder's own full-res JPEG-q50 control (the distortion
     the protocol already demands robustness to,
     `evaluation/utils_eval.py:284-290`) in both bit and logit space.

Writes INT8GEN_CROSS JSON; run via:
  python scripts/int8gen_cross.py --out /tmp/int8gen_cross --steps 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")   # tiny nets dispatch faster on host

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def train_decoder(steps: int, out: str, int8_gen: bool, seed: int):
    from aqualora_tpu.train import rob_enhance_finetune as s3
    argv = ["--tiny", "--max_train_steps", str(steps),
            "--train_batch_size", "4", "--output_dir", out,
            "--checkpointing_steps", str(steps * 2),
            "--seed", str(seed),
            # bf16 generation in BOTH legs' training loops, so the
            # protocol is exactly two dtypes: the bf16_gen leg really
            # generates bf16 (matching the bf16 eval pipeline below) and
            # int8_gen differs from it ONLY by the int8-conv kernels.
            # (First recorded run trained in f32 — a three-dtype
            # conflation caught in review and re-run.)
            "--mixed_precision", "bf16",
            "--log_every", str(max(1, steps // 4))]
    if int8_gen:
        argv.append("--int8_gen")
    res = s3.run(s3.build_argparser().parse_args(argv))
    return res["dparams"], res["batch_stats"], res["history"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--num_images", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from aqualora_tpu.core.tokenizer import load_tokenizer
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
    from aqualora_tpu.eval.distortions import jpeg_compress
    from aqualora_tpu.models.watermark import SecretDecoder
    from aqualora_tpu.ops.quant import quantize_unet_params_int8
    from aqualora_tpu.train.ppft_train import build_configs

    decs = {}
    for name, int8_gen in (("bf16_gen", False), ("int8_gen", True)):
        print(f"== training stage-3 tiny decoder [{name}] "
              f"({args.steps} steps) ==", flush=True)
        dparams, bstats, hist = train_decoder(
            args.steps, os.path.join(args.out, name), int8_gen, args.seed)
        decs[name] = (dparams, bstats, float(hist[-1]["acc"]) if hist
                      else float("nan"))

    # eval set: same pipeline init as s3.run (seed stream replicated),
    # FRESH generation keys/messages (eval seed offset)
    cfg, backbone, base_res = build_configs(
        argparse.Namespace(tiny=True))
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    kinit, _, _ = jax.random.split(jax.random.PRNGKey(args.seed), 3)
    params = pipe.init_params(kinit, height=base_res, width=base_res)
    params = jax.device_put(params)
    res = 48                                     # a training bucket size
    gen = pipe.make_generate(num_steps=2, sampler="dpms_m",
                             height=res, width=res)
    tokenizer = load_tokenizer(None, vocab_size=cfg.clip.vocab_size)
    params_q = dict(params)
    params_q["unet"] = quantize_unet_params_int8(
        params["unet"], include_convs=True, include_dense=False)

    B = 4
    if args.num_images < B or args.num_images % B:
        raise SystemExit(f"--num_images must be a positive multiple of "
                         f"{B} (got {args.num_images}); a silent floor "
                         f"division would misreport coverage")
    ekey = jax.random.PRNGKey(args.seed + 1234)
    sets = {"bf16": [], "int8": []}
    msgs = []
    for i in range(args.num_images // B):
        ekey, kmsg, kgen = jax.random.split(ekey, 3)
        msg = jax.random.bernoulli(
            kmsg, 0.5, (B, cfg.watermark.msg_bits)).astype(jnp.float32)
        msgs.append(np.asarray(msg))
        ids = jnp.asarray(tokenizer([f"eval caption {i}"] * B))
        neg = jnp.asarray(tokenizer([""] * B))
        for label, p in (("bf16", params), ("int8", params_q)):
            diag = pipe.message_scale(
                dict(p), msg, multiplier=cfg.watermark.inference_scale)
            imgs = gen(p, ids, neg, kgen, 7.5, diag)
            sets[label].append(np.asarray((imgs + 1.0) / 2.0, np.float32))
    for k in sets:
        sets[k] = np.clip(np.concatenate(sets[k]), 0.0, 1.0)
    msgs = np.concatenate(msgs)
    # protocol-exact control: REAL JPEG q50 at generation resolution
    # (jpeg_compress already returns a stacked float32 (N,H,W,3) array)
    sets["jpeg50"] = jpeg_compress(sets["bf16"], None, quality=50)

    msgdecoder = SecretDecoder(cfg.watermark.msg_bits, backbone)

    def decode(dparams, bstats, imgs01):
        # chunked so a higher-powered --num_images re-run doesn't scale
        # decoder memory linearly; margin convention (logits[...,1] -
        # logits[...,0], bit = margin > 0) matches
        # eval/utils_eval.simple_decode:406.
        margins = []
        for i in range(0, imgs01.shape[0], 16):
            logits = msgdecoder.apply(
                {"params": dparams, "batch_stats": bstats},
                jnp.asarray(imgs01[i:i + 16]) * 2.0 - 1.0, False)
            logits = np.asarray(logits, np.float32)
            margins.append(logits[..., 1] - logits[..., 0])
        margins = np.concatenate(margins, axis=0)
        return (margins > 0).astype(np.int32), margins

    def agreement(a, b):
        return float((a == b).mean())

    report = {"steps": args.steps, "num_images": int(msgs.shape[0]),
              "msg_bits": int(cfg.watermark.msg_bits), "decoders": {}}
    for name, (dparams, bstats, final_acc) in decs.items():
        bits = {k: decode(dparams, bstats, v) for k, v in sets.items()}
        d_cross = float(np.abs(bits["bf16"][1] - bits["int8"][1]).mean())
        d_jpeg = float(np.abs(bits["bf16"][1] - bits["jpeg50"][1]).mean())
        rep = {
            "stage1_style_final_acc": final_acc,
            "bit_acc_bf16_imgs": float(
                (bits["bf16"][0] == msgs).mean()),
            "agreement_int8_vs_bf16_imgs":
                agreement(bits["bf16"][0], bits["int8"][0]),
            "agreement_jpeg50_control":
                agreement(bits["bf16"][0], bits["jpeg50"][0]),
            "margin_delta_int8": d_cross,
            "margin_delta_jpeg50": d_jpeg,
            "int8_delta_over_jpeg50": float(d_cross / max(d_jpeg, 1e-12)),
        }
        report["decoders"][name] = rep
        print(f"[{name}] train acc {final_acc:.3f}  cross-dtype bit "
              f"agreement {rep['agreement_int8_vs_bf16_imgs']:.4f} "
              f"(JPEG-q50 control "
              f"{rep['agreement_jpeg50_control']:.4f}); margin deltas "
              f"int8 {d_cross:.4g} vs q50 {d_jpeg:.4g} "
              f"(ratio {rep['int8_delta_over_jpeg50']:.3f})", flush=True)

    a, b = (report["decoders"]["bf16_gen"],
            report["decoders"]["int8_gen"])
    report["transfer"] = {
        "agreement_gap":
            abs(a["agreement_int8_vs_bf16_imgs"]
                - b["agreement_int8_vs_bf16_imgs"]),
        "both_within_jpeg50_control": bool(
            a["agreement_int8_vs_bf16_imgs"]
            >= a["agreement_jpeg50_control"] - 0.005
            and b["agreement_int8_vs_bf16_imgs"]
            >= b["agreement_jpeg50_control"] - 0.005),
    }
    path = os.path.join(args.out, "int8gen_cross.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps(report["transfer"]))


if __name__ == "__main__":
    main()
