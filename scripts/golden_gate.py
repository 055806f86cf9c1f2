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
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    p.add_argument("--model", type=str, default="sd15",
                   choices=("sd15", "sd21"),
                   help="pipeline family for the gate (ignored with "
                        "--tiny); sd21 certifies the int8-conv default "
                        "on the d=64 SD-2.1 stack too")
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
    p.add_argument("--via_merge", action="store_true",
                   help="ALSO certify the README merge workflow "
                        "(README.md:39-43): folded LoRA -> webui layout -> "
                        "merge_lora -> LDM checkpoint -> reload -> "
                        "generate; asserts the merged model reproduces "
                        "the fold-path images")
    p.add_argument("--int8", nargs="?", const="conv", default=False,
                   choices=("conv", "dense", "all", "vae", "conv+vae",
                            "dense+vae", "all+vae"),
                   help="ALSO generate with int8 serving (ops/quant.py; "
                        "bare --int8 = conv-only, the recommended config) "
                        "and report bf16<->int8 image delta + decoded-bit "
                        "agreement — the bit-accuracy evidence that gates "
                        "promoting int8 serving")
    p.add_argument("--min_int8_agreement", type=float, default=0.98,
                   help="asserted lower bound on the bf16<->int8 "
                        "decoded-bit agreement whenever --int8 runs "
                        "(synthetic included — agreement needs no real "
                        "weights to be meaningful); 0 disables. int8 "
                        "serving stays the default only while this holds")
    p.add_argument("--train_decoder_steps", type=int, default=0,
                   help="ALSO train a tiny stage-1 decoder for N steps "
                        "(latent_wm_pretrain --tiny) and measure the "
                        "bf16<->int8 decode agreement through IT — a "
                        "trained net has structured decision boundaries "
                        "that a random-init one may lack, so this leg "
                        "guards the int8 promotion against the "
                        "random-decoder-is-too-forgiving objection")
    p.add_argument("--seed", type=int, default=0)
    return p


def _merged_params_via_ldm(params, lora, out_dir, v2=False):
    """README.md:39-43 merge workflow on real artifact files:
    diffusers_lora_to_webui -> merge_lora into the SD states -> save a
    single-file LDM checkpoint (+SAI-style roundtrip via save/load) ->
    convert back -> flax params.  Returns params for generation WITHOUT
    runtime LoRA (the message is baked into the weights).  `v2` writes
    the SD-2.x single-file layout (open-CLIP tower, Linear proj_in/out
    — model_util.py:244-392,560-574); the reload side auto-detects."""
    import numpy as np
    from flax import traverse_util as tu

    from aqualora_tpu.core import io
    from aqualora_tpu.tools import ldm_convert, lora_layouts
    from aqualora_tpu.tools.merge_lora import merge_lora_into_states
    from aqualora_tpu.train.ppft_train import split_lora

    def to_torch(tree, exclude_lora=False, prefix=""):
        out = {}
        for path, v in tu.flatten_dict(tree).items():
            if exclude_lora and "lora" in path:
                continue
            tpath, tv = io.flax_tensor_to_torch(path,
                                                np.asarray(v, np.float32))
            out[prefix + io.flax_path_to_torch_key(tpath)] = tv
        return out

    unet_t = to_torch(params["unet"], exclude_lora=True)
    vae_t = to_torch(params["vae"])
    te_t = to_torch(params["text_encoder"], prefix="text_model.")

    # step 1: diffusers LoRA -> webui layout (diffusers_lora_to_webui.py)
    webui = lora_layouts.diffusers_to_webui(lora)
    webui_path = os.path.join(out_dir, "watermark.safetensors")
    io.save_safetensors(webui, webui_path)
    # step 2: merge into the SD model states (merge_lora.py:80-127)
    merge_lora_into_states(unet_t, te_t, io.load_safetensors(webui_path))
    # step 3: single-file LDM checkpoint on disk (merge_lora.py:130-179)
    merged_path = os.path.join(out_dir, "watermark_SDmodel.safetensors")
    io.save_safetensors(
        ldm_convert.diffusers_to_ldm(unet_t, vae_t, te_t, v2=v2),
        merged_path)
    # reload: LDM -> diffusers -> flax (the consumer side of the
    # workflow).  NB: don't unpack into `v2` — that name is this
    # function's version flag.
    u_new, v_new, t_new = ldm_convert.ldm_to_diffusers(
        io.load_safetensors(merged_path))
    out = dict(params)
    base_flat, lora_flat = split_lora(params["unet"])
    loaded = tu.flatten_dict(io.torch_state_to_flax_params(u_new))
    out["unet"] = tu.unflatten_dict(
        {**{k: loaded[k] for k in base_flat}, **lora_flat})
    out["vae"] = io.torch_state_to_flax_params(v_new)
    t_new = {k[len("text_model."):] if k.startswith("text_model.") else k: v
             for k, v in t_new.items()}
    t_new = {k.replace("embeddings.", "").replace("encoder.", ""): v
             for k, v in t_new.items() if "position_ids" not in k}
    out["text_encoder"] = io.torch_state_to_flax_params(t_new)
    return out


def run(args) -> dict:
    import jax

    from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
    from aqualora_tpu.eval import fid as fid_mod
    from aqualora_tpu.eval.prompts import load_prompts
    from aqualora_tpu.eval.utils_eval import simple_decode, simple_sample
    from aqualora_tpu.tools.create_wm_lora import create_watermark_lora
    from aqualora_tpu.tools.port_reference_artifacts import port

    # persistent compile cache: full-size TPU compiles take 10-20 min
    # through the tunnel; reruns are seconds (no-op on CPU CI)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.tiny:
        cfg = PipelineConfig.tiny()
        backbone = EfficientNetConfig.tiny(num_classes=args.msg_bits * 2)
        args.resolution = min(args.resolution, 64)
        args.num_inference_steps = min(args.num_inference_steps, 4)
    else:
        cfg = (PipelineConfig.sd21(lora_rank=args.rank)
               if args.model == "sd21"
               else PipelineConfig.sd15(lora_rank=args.rank))
        backbone = EfficientNetConfig.b1(num_classes=args.msg_bits * 2)
    if cfg.watermark.msg_bits != args.msg_bits:
        from dataclasses import replace
        cfg = replace(cfg, watermark=replace(cfg.watermark,
                                             msg_bits=args.msg_bits))

    if args.train_decoder_steps and not args.int8:
        # the trained-decoder leg exists solely to calibrate the int8
        # agreement; without --int8 it would silently never run and a
        # multi-hour full-scale gate would come back missing the leg the
        # user asked for
        raise SystemExit("--train_decoder_steps measures bf16<->int8 "
                         "decode agreement and requires --int8 (e.g. "
                         "--int8 conv)")

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

    params = None
    if args.via_merge or args.int8:
        # share one base-weight tree between the compared paths so
        # their outputs are comparable (mirrors simple_sample's own init)
        import jax

        from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
        pipe = StableDiffusionPipeline(cfg)
        params = pipe.init_params(jax.random.PRNGKey(0),
                                  height=args.resolution,
                                  width=args.resolution)
        if args.sd_model:
            from aqualora_tpu.train.ppft_train import _load_sd_checkpoint
            params = _load_sd_checkpoint(args.sd_model, params)

    prompts = load_prompts(None, args.num_prompts)
    img_dir = os.path.join(args.out, "images")
    images = simple_sample(
        args.sd_model if params is None else None, args.sampler, prompts,
        lora=lora, seeds=[args.seed],
        output_dir=img_dir, config=cfg,
        num_inference_steps=args.num_inference_steps,
        batch_size=args.batch_size, resolution=args.resolution,
        params=params)
    print(f"generated {len(images)} images at {args.resolution}^2")

    bit_acc, tpr, decoded, marg_bf16 = simple_decode(
        args.msg_bits, os.path.join(ported, "msgdecoder"), images,
        msg_gt=bitstring, resolution=backbone.decoder_resolution,
        tpr_threshold=args.fpr, backbone=backbone, return_margins=True)
    print(f"bit accuracy: {bit_acc:.4f}  TPR@FPR{args.fpr:g}: {tpr:.4f}")

    merge_img_diff = None
    if args.via_merge:
        # README merge workflow: the merged LDM checkpoint must reproduce
        # the fold-path images (runtime LoRA at scale 1.0 == baked W+dW)
        merged = _merged_params_via_ldm(
            params, lora, args.out,
            v2=(not args.tiny and args.model == "sd21"))
        images_m = simple_sample(
            None, args.sampler, prompts, lora=None, seeds=[args.seed],
            output_dir=os.path.join(args.out, "images_merged"), config=cfg,
            num_inference_steps=args.num_inference_steps,
            batch_size=args.batch_size, resolution=args.resolution,
            params=merged)
        diffs = [np.abs(np.asarray(a, np.int16)
                        - np.asarray(b, np.int16)).mean()
                 for a, b in zip(images, images_m)]
        merge_img_diff = float(np.mean(diffs))
        assert merge_img_diff < 4.0, (
            f"merged-model images diverge from fold path: mean abs diff "
            f"{merge_img_diff:.2f}/255")
        acc_m, tpr_m, _ = simple_decode(
            args.msg_bits, os.path.join(ported, "msgdecoder"), images_m,
            msg_gt=bitstring, resolution=backbone.decoder_resolution,
            tpr_threshold=args.fpr, backbone=backbone)
        print(f"merge workflow: mean image diff {merge_img_diff:.3f}/255, "
              f"bit accuracy {acc_m:.4f} (fold path {bit_acc:.4f}) OK")

    int8_report = None
    if args.int8:
        # int8-serving accuracy evidence: same weights/seeds, quantized
        # kernels (ops/quant.py).  Two observables gate promoting int8:
        # the image delta vs the bf16 path and — decisive — whether the
        # decoder reads the SAME bits from the int8-generated images.
        images_q = simple_sample(
            None, args.sampler, prompts, lora=lora, seeds=[args.seed],
            output_dir=os.path.join(args.out, f"images_int8_{args.int8}"),
            config=cfg, num_inference_steps=args.num_inference_steps,
            batch_size=args.batch_size, resolution=args.resolution,
            params=params, int8=args.int8)
        img_diff = float(np.mean(
            [np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16)).mean()
             for a, b in zip(images, images_q)]))
        acc_q, tpr_q, decoded_q, marg_q = simple_decode(
            args.msg_bits, os.path.join(ported, "msgdecoder"), images_q,
            msg_gt=bitstring, resolution=backbone.decoder_resolution,
            tpr_threshold=args.fpr, backbone=backbone, return_margins=True)
        agree = float(np.mean([
            np.mean([x == y for x, y in zip(d, dq)])
            for d, dq in zip(decoded, decoded_q)]))
        # Logit-space sensitivity — the non-vacuous form of the
        # release-decoder claim.  A random-weight decoder's per-bit
        # logit margins can sit so far from zero that EVERY image
        # decodes to the same string (observed at SD-1.5 scale:
        # bit-constant over 32 diverse images), making bit agreement
        # trivially 1.0.  The quantitative statement is in logit
        # space: the int8 path perturbs the margins by `delta`, which
        # must be small against (a) the decoder's smallest decision
        # margin (no flip is *possible* while max delta < min margin)
        # and (b) the cross-image margin spread (the decoder responds
        # far more to image identity than to int8 quantization noise).
        delta = np.abs(marg_bf16 - marg_q)
        spread = np.abs(marg_bf16 - marg_bf16.mean(axis=0, keepdims=True))
        min_margin = float(np.abs(marg_bf16).min())
        spread_mean = float(spread.mean())
        # spread==0 (single image, or a margin-constant decoder) makes
        # delta/spread undefined — report None, not a ~1e12 artifact
        logit_sens = {
            "mean_abs_margin": float(np.abs(marg_bf16).mean()),
            "min_abs_margin": min_margin,
            "int8_margin_delta_mean": float(delta.mean()),
            "int8_margin_delta_max": float(delta.max()),
            "cross_image_spread_mean": spread_mean,
            "max_delta_over_min_margin":
                float(delta.max() / max(min_margin, 1e-12)),
            "mean_delta_over_spread":
                (float(delta.mean() / spread_mean)
                 if spread_mean > 0 else None),
            "release_decoder_bit_constant":
                bool(len(set(decoded)) == 1),
        }
        int8_report = {"mode": args.int8, "img_diff": img_diff,
                       "bit_acc": float(acc_q), "tpr": float(tpr_q),
                       "n_images": len(images),
                       "decode_agreement_vs_bf16": agree,
                       "logit_sensitivity": logit_sens}
        print(f"int8[{args.int8}] serving: mean image diff "
              f"{img_diff:.3f}/255, decoded-bit agreement vs bf16 "
              f"{agree:.4f} over {len(images)} images, bit accuracy "
              f"{acc_q:.4f} (bf16 {bit_acc:.4f})")
        ds = logit_sens["mean_delta_over_spread"]
        print(f"int8[{args.int8}] logit sensitivity: margin delta "
              f"mean {logit_sens['int8_margin_delta_mean']:.4g} / max "
              f"{logit_sens['int8_margin_delta_max']:.4g} vs min "
              f"decision margin {min_margin:.4g} "
              f"(ratio {logit_sens['max_delta_over_min_margin']:.3f}) "
              f"and cross-image spread "
              f"{logit_sens['cross_image_spread_mean']:.4g} "
              f"(delta/spread "
              f"{f'{ds:.3f}' if ds is not None else 'n/a — zero spread'}); "
              f"bit-constant decoder: "
              f"{logit_sens['release_decoder_bit_constant']}")
        if args.train_decoder_steps:
            # Second agreement leg through a TRAINED decoder: stage-1
            # tiny (the reference's latent-watermark pretrain,
            # train/latent_wm_pretrain.py) runs in a CPU SUBPROCESS
            # (keeps the TPU free; tiny models dispatch faster on host)
            # until the decoder actually learns, then reads both image
            # sets through it.  Random decoders might sit far from any
            # decision boundary and under-report int8 perturbation
            # sensitivity; a trained decoder's boundaries are where real
            # deployments live.
            #   Calibration control: these gate images are
            # out-of-distribution for the tiny decoder (it trained on
            # tiny-VAE watermarks), so raw agreement conflates int8
            # sensitivity with OOD margin noise.  The yardstick is the
            # protocol's own distortion — REAL JPEG quality 50 at FULL
            # resolution (evaluation/utils_eval.py:284-290), exactly as
            # run_eval_distortion applies it (compress at generation
            # size, then the decoder's own resize): int8 must flip no
            # more of this decoder's bits than the distortion the
            # protocol already demands robustness to.  A q95 full-res
            # control is also reported for context.  (History: the
            # first full-scale run used a raw 0.98 absolute threshold
            # on a decoder that had NOT learned (acc 0.469) and tripped
            # at 0.9766; a second design compressed AFTER the 8x
            # downsample to the tiny decoder's input — blocking
            # artifacts landed directly at decoder resolution instead
            # of being low-passed as the protocol path would, inflating
            # the control's disagreement and making the assert more
            # lenient than documented.  Both superseded by this
            # protocol-exact ordering — docs/PERFORMANCE.md "int8
            # promotion evidence".)
            import subprocess
            import sys as _sys

            from aqualora_tpu.core.config import WatermarkConfig
            from aqualora_tpu.eval.distortions import jpeg_compress
            tdir = os.path.join(args.out, "trained_tiny_decoder")
            tpath = os.path.join(tdir, "msgdecoder_only")
            acc_json = os.path.join(tdir, "train_result.json")
            # SyntheticDataset is 256 samples -> 32 steps/epoch at batch
            # 8; size --epochs so the requested step count actually runs
            # (epochs bound the data pass — max_train_steps only caps).
            # --warmup 0: the reference's warmup curriculum gates on
            # msgloss < 0.1, which a tiny fresh decoder takes thousands
            # of steps to reach; the leg wants the watermark task
            # trained directly.
            steps_per_epoch = max(1, 256 // 8)
            epochs = max(1, -(-args.train_decoder_steps // steps_per_epoch))
            s1_argv = ["--tiny", "--epochs", str(epochs),
                       "--batch_size", "8", "--warmup", "0",
                       "--max_train_steps", str(args.train_decoder_steps),
                       "--output_dir", tdir,
                       "--log_every",
                       str(max(1, args.train_decoder_steps // 4))]
            root = os.path.dirname(os.path.dirname(os.path.abspath(
                __file__)))
            script = (
                "import jax; jax.config.update('jax_platforms', 'cpu')\n"
                f"import sys, json; sys.path.insert(0, {root!r})\n"
                "from aqualora_tpu.train import latent_wm_pretrain as s1\n"
                f"res = s1.run(s1.build_argparser()"
                f".parse_args({s1_argv!r}))\n"
                "from aqualora_tpu.core.checkpoint import save_pytree\n"
                f"save_pytree({tpath!r}, "
                "{'params': res['params']['sec_decoder'], "
                "'batch_stats': res['batch_stats']})\n"
                f"json.dump({{'final_acc': float(res['final_acc'])}}, "
                f"open({acc_json!r}, 'w'))\n")
            subprocess.run([_sys.executable, "-c", script], check=True)
            final_acc = json.load(open(acc_json))["final_acc"]
            tiny_bits = WatermarkConfig.tiny().msg_bits
            tiny_backbone = EfficientNetConfig.tiny(
                num_classes=tiny_bits * 2)
            dres = tiny_backbone.decoder_resolution

            def tdecode(imgs):
                _, _, bits, marg = simple_decode(
                    tiny_bits, tpath, imgs, msg_gt=None, resolution=dres,
                    backbone=tiny_backbone, return_margins=True)
                return bits, marg

            def agreement(a, b):
                return float(np.mean([
                    np.mean([x == y for x, y in zip(d, dq)])
                    for d, dq in zip(a, b)]))

            from PIL import Image

            def jpeg_full_res(quality):
                # protocol ordering: compress at generation resolution,
                # decode through the decoder's own resize — NOT
                # resize-then-compress
                x01 = np.stack([np.asarray(im, np.float32) / 255.0
                                for im in images])
                return [Image.fromarray(
                    (im * 255).clip(0, 255).astype(np.uint8))
                    for im in jpeg_compress(x01, None, quality=quality)]

            dec_t, marg_t = tdecode(images)
            dec_ti8, marg_ti8 = tdecode(images_q)
            dec_t50, marg_t50 = tdecode(jpeg_full_res(50))
            dec_t95, marg_t95 = tdecode(jpeg_full_res(95))
            agree_t = agreement(dec_t, dec_ti8)
            control = agreement(dec_t, dec_t50)
            control95 = agreement(dec_t, dec_t95)
            # same protocol-relative comparison in LOGIT space: how hard
            # does int8 push this (trained, near-boundary) decoder's
            # margins vs the JPEG-q50 distortion the protocol already
            # demands robustness to?  Unlike bit agreement this does not
            # saturate, so it resolves the slim-bit-margin regime.
            d_i8 = float(np.abs(marg_t - marg_ti8).mean())
            d_50 = float(np.abs(marg_t - marg_t50).mean())
            d_95 = float(np.abs(marg_t - marg_t95).mean())
            int8_report["trained_decoder"] = {
                "stage1_steps": args.train_decoder_steps,
                "stage1_final_acc": final_acc,
                "decode_agreement_vs_bf16": agree_t,
                "jpeg50_control_agreement": control,
                "jpeg95_control_agreement": control95,
                "margin_delta_int8": d_i8,
                "margin_delta_jpeg50": d_50,
                "margin_delta_jpeg95": d_95,
                "int8_delta_over_jpeg50":
                    float(d_i8 / max(d_50, 1e-12)),
                # pre-registered rule (docs/PERFORMANCE.md "decisive
                # form"): logit ratio > 1 => int8 is opt-in for this
                # model family.  Recorded, not asserted: the demotion is
                # a default-setting decision, not a run failure (SD-2.1
                # tripped it in round 5 and was demoted as registered).
                "demotion_rule_met": bool(d_i8 > d_50)}
            print(f"int8[{args.int8}] trained-decoder leg: decoded-bit "
                  f"agreement vs bf16 {agree_t:.4f} over {len(images)} "
                  f"images (protocol JPEG-q50 control {control:.4f}, "
                  f"q95 {control95:.4f}; stage-1 "
                  f"{args.train_decoder_steps} steps, train acc "
                  f"{final_acc:.3f})")
            print(f"int8[{args.int8}] trained-decoder logit deltas: "
                  f"int8 {d_i8:.4g} vs JPEG-q50 control {d_50:.4g} "
                  f"(ratio {d_i8 / max(d_50, 1e-12):.3f}; q95 "
                  f"{d_95:.4g})")
        if not args.synthetic:
            assert acc_q >= args.min_bit_acc, (
                f"int8 bit accuracy {acc_q:.4f} < {args.min_bit_acc}")

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
              "synthetic": bool(args.synthetic),
              "model": "tiny" if args.tiny else args.model,
              "merge_img_diff": merge_img_diff, "int8": int8_report}
    with open(os.path.join(args.out, "golden_gate.json"), "w") as f:
        json.dump(result, f, indent=1)
    if int8_report is not None and args.min_int8_agreement > 0:
        # the promotion gate itself (VERDICT r3 #1): int8 serving stays
        # the bench/serving default only while the quantized path reads
        # the SAME bits as bf16.  Asserted after the JSON dump so a
        # failing run still leaves evidence.
        #   release decoder (the deployment config): absolute threshold.
        #   trained tiny decoder: judged against its own REAL full-res
        #   JPEG-q50 control (the protocol's distortion,
        #   evaluation/utils_eval.py:284-290) — the gate images are
        #   out-of-distribution for it, so the meaningful claim is
        #   "int8 flips no more of its bits than the distortion the
        #   protocol already demands robustness to".
        a = int8_report["decode_agreement_vs_bf16"]
        assert a >= args.min_int8_agreement, (
            f"int8[{args.int8}] release-decoder decode agreement "
            f"{a:.4f} < {args.min_int8_agreement} — demote int8 serving "
            f"to opt-in (AQUALORA_BENCH_INT8=0 and drop the bench.py "
            f"default)")
        if "trained_decoder" in int8_report:
            td = int8_report["trained_decoder"]
            at, ac = (td["decode_agreement_vs_bf16"],
                      td["jpeg50_control_agreement"])
            assert at >= ac - 0.005, (
                f"int8[{args.int8}] trained-decoder decode agreement "
                f"{at:.4f} is below its full-res JPEG-q50 control "
                f"{ac:.4f} — int8 perturbs this decoder MORE than the "
                f"protocol's own distortion; demote int8 serving to "
                f"opt-in (AQUALORA_BENCH_INT8=0 and drop the bench.py "
                f"default)")
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
