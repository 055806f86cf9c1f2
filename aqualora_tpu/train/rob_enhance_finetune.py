"""Stage 3 — robustness-enhancement fine-tune of the message decoder.

TPU-native re-implementation of `train/rob_enhance_finetune.py`: freeze
everything except the msgdecoder (`:797-804,978-982`); per step
(`:995-1080`):
  msg -> mapper -> diag scale x1.03 (doubled internally for CFG — our
  pipeline applies the scale to both CFG halves, `:999-1002`), full
  DPM-Solver++ 20-step generation at a random resolution
  H,W in {512,576,640,704,768} (`:1004-1015`, no grad), mild random
  distortion over [identity, jitter, crop, blur, noise] with probs
  [0.6,.1,.15,.05,.1] (`:121-132,1018-1025`), BCE between decoder logits
  and the message (`:1027-1035`), backprop through the decoder only.

The reference's random resolutions retrace nothing on GPU; on TPU each
resolution is a separate static shape, so we pre-build one jitted
generator per resolution bucket and pick a bucket per step on the host —
the SURVEY.md §7 "bucketed shapes" answer to the hard dynamic-shape
problem.
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from typing import Any, Dict

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqualora_tpu.core import io
from aqualora_tpu.core import sharding as sh
from aqualora_tpu.core.checkpoint import CheckpointManager, load_pytree
from aqualora_tpu.core.tokenizer import load_tokenizer
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.distort.noiser import Stage3Noiser
from aqualora_tpu.models.watermark import SecretDecoder
from aqualora_tpu.train import data as data_lib
from aqualora_tpu.train.losses import bit_accuracy, message_bce
from aqualora_tpu.train.ppft_train import (build_argparser as ppft_argparser,
                                           build_configs,
                                           _load_sd_checkpoint,
                                           cosine_with_warmup_lr_end)

RESOLUTIONS = (512, 576, 640, 704, 768)   # rob_enhance_finetune.py:1004-1005


def make_decoder_step(msgdecoder: SecretDecoder, optimizer):
    """Jitted decoder-only update on already-generated (distorted) images."""
    noiser = Stage3Noiser()

    def loss_fn(dparams, batch_stats, images01, msg, key):
        kd, kdrop = jax.random.split(key)
        noised = noiser(kd, images01)
        # decoder consumes [-1, 1] (it resizes to 512 internally)
        logits, updates = msgdecoder.apply(
            {"params": dparams, "batch_stats": batch_stats},
            noised * 2.0 - 1.0, True, mutable=["batch_stats"],
            rngs={"dropout": kdrop})
        loss = message_bce(logits, msg)
        return loss, (updates["batch_stats"],
                      {"loss": loss, "acc": bit_accuracy(logits, msg)})

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(dparams, batch_stats, opt_state, images01, msg, key):
        (_, (bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(dparams, batch_stats, images01, msg, key)
        updates, opt_state = optimizer.update(grads, opt_state, dparams)
        dparams = optax.apply_updates(dparams, updates)
        return dparams, bs, opt_state, metrics

    return step


def run(args: argparse.Namespace) -> Dict[str, Any]:
    cfg, backbone, base_res = build_configs(args)
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    pipe = StableDiffusionPipeline(cfg, dtype=dtype)
    msgdecoder = SecretDecoder(cfg.watermark.msg_bits, backbone)
    tiny = getattr(args, "tiny", False)
    resolutions = (32, 48) if tiny else RESOLUTIONS
    gen_steps = 2 if tiny else 20          # pipeline(..., 20 steps) `:1008`

    key = jax.random.PRNGKey(args.seed or 0)
    kinit, kdec, key = jax.random.split(key, 3)
    params = pipe.init_params(kinit, height=base_res, width=base_res)
    if args.pretrained_model_name_or_path:
        params = _load_sd_checkpoint(args.pretrained_model_name_or_path, params)

    dec_vars = msgdecoder.init(kdec, jnp.zeros((1, base_res, base_res, 3)))
    dparams = dec_vars["params"]
    batch_stats = dec_vars.get("batch_stats", {})
    if args.start_from_pretrain:
        pre = load_pytree(args.start_from_pretrain,
                          {"sec_encoder": None,
                           "sec_decoder": {"params": dparams,
                                           "batch_stats": batch_stats}})
        dparams = pre["sec_decoder"]["params"]
        batch_stats = pre["sec_decoder"]["batch_stats"]

    if args.resume_from_lora:
        lora_state = io.load_safetensors(os.path.join(
            args.resume_from_lora, "pytorch_lora_weights.safetensors"))
        params["unet"] = io.import_lora_safetensors(params["unet"], cfg.unet,
                                                    lora_state)
        mapper_state = io.load_safetensors(
            os.path.join(args.resume_from_lora, "mapper.safetensors"))
        params["mapper"] = {"bit_embeddings":
                            np.asarray(mapper_state["bit_embeddings.weight"])}

    # DP mesh over ICI: batch inputs sharded on the data axis; the
    # generators and the decoder step pick the sharding up via GSPMD
    # (no pmap, no manual collectives).  device_put the generation params
    # once up front: LoRA/mapper imports leave host-numpy leaves that
    # would re-upload ~GBs per step (measured 47x in bench_stage3).
    mesh = sh.make_data_mesh(args.train_batch_size)
    if getattr(args, "fsdp", False) and mesh.shape[sh.DATA_AXIS] > 1:
        # stage 3 freezes the ENTIRE SD stack (rob_enhance_finetune.py:
        # 797-804) — the biggest weight-FSDP payoff of the three stages:
        # U-Net + VAE + CLIP live sharded over the data axis and GSPMD
        # all-gathers each layer inside the generation loop.
        params = sh.shard_fsdp(mesh, params)
    else:
        params = sh.replicate(mesh, params)

    if getattr(args, "int8_gen", False):
        # the whole SD stack is frozen and the per-step 20-step DPM++
        # generation is no-grad (reference rob_enhance_finetune.py:
        # 1004-1015) — so the promoted int8-conv SERVING config applies
        # verbatim: quantize the U-Net conv kernels once, on device, and
        # every generator below picks the int8 kernels up through the
        # dtype-driven module branch (ops/quant.py).  The runtime
        # message LoRA rides on top in bf16 (models/lora.py adds the
        # delta after the int8 base path).
        from aqualora_tpu.ops.quant import quantize_unet_params_int8
        params["unet"] = jax.jit(functools.partial(
            quantize_unet_params_int8, include_convs=True,
            include_dense=False))(params["unet"])

    # one jitted generator per resolution bucket (static shapes for XLA)
    generators = {r: pipe.make_generate(num_steps=gen_steps, sampler="dpms_m",
                                        height=r, width=r)
                  for r in resolutions}

    dataset = data_lib.make_dataset(
        args.train_data_dir, base_res, dataset_name=args.dataset_name,
        max_samples=args.max_train_samples,
        caption_column=args.caption_column, image_column=args.image_column,
        config_name=args.dataset_config_name,
        num_threads=args.dataloader_num_workers)
    steps_per_epoch = max(1, len(dataset) //
                          (args.train_batch_size * jax.process_count()))
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

    lr_fn = cosine_with_warmup_lr_end(args.learning_rate,
                                      args.lr_warmup_steps, max_steps,
                                      args.lr_end)
    optimizer = optax.adamw(lr_fn, b1=args.adam_beta1, b2=args.adam_beta2,
                            eps=args.adam_epsilon,
                            weight_decay=args.adam_weight_decay)
    opt_state = optimizer.init(dparams)
    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             max_to_keep=args.checkpoints_total_limit)
    start_step = 0
    if args.resume_from_checkpoint:
        # same contract as ppft_train: "latest" or an explicit step; the
        # crashed run's decoder/optimizer state resumes instead of
        # silently restarting (each stage-3 step is a full 20-step
        # generation — restarts are expensive)
        at = (None if args.resume_from_checkpoint == "latest"
              else int(args.resume_from_checkpoint))
        state = ckpt.restore({"dparams": dparams, "batch_stats": batch_stats,
                              "opt_state": opt_state, "step": 0}, at)
        dparams, batch_stats = state["dparams"], state["batch_stats"]
        opt_state = state["opt_state"]
        start_step = int(state["step"])
    # decoder state replicated (the EfficientNet-B1 head is small and the
    # artifact-save path reads it whole); BN statistics reduce over the
    # GLOBAL batch because the batch axis is sharded and XLA inserts the
    # cross-chip mean/var collectives (tests/test_parallel.py stage-3 DP
    # equivalence)
    dparams = sh.replicate(mesh, dparams)
    batch_stats = sh.replicate(mesh, batch_stats)
    opt_state = sh.replicate(mesh, opt_state)
    dec_step = make_decoder_step(msgdecoder, optimizer)
    tokenizer = load_tokenizer(args.tokenizer_vocab,
                               vocab_size=cfg.clip.vocab_size)

    from aqualora_tpu.utils.logging import Tracker
    tracker = Tracker(args.output_dir, args.report_to)
    rng = np.random.default_rng(args.seed or 0)
    data_iter = data_lib.prefetch(dataset.batches(
        args.train_batch_size, seed=args.seed or 0,
        process_index=jax.process_index(),
        process_count=jax.process_count()))
    history = []
    t0 = time.time()
    for step_i in range(1, max_steps + 1):
        _, captions = next(data_iter)       # captions only (`:880-891`)
        res = int(rng.choice(resolutions))  # host-side bucket pick
        key, kmsg, kgen, kstep = jax.random.split(key, 4)
        if step_i <= start_step:
            continue    # resume replay: consume the host data/PRNG
                        # streams so the resumed run sees the same draws
        ids = sh.shard_batch(mesh, jnp.asarray(
            tokenizer(captions or [""] * args.train_batch_size)))
        neg = sh.shard_batch(mesh, jnp.asarray(
            tokenizer([""] * args.train_batch_size)))
        msg = sh.shard_batch(mesh, jax.random.bernoulli(
            kmsg, 0.5, (args.train_batch_size,
                        cfg.watermark.msg_bits)).astype(jnp.float32))
        # diag scale x1.03 (`:1002`); generation is no-grad by construction
        diag = pipe.message_scale(
            dict(params), msg, multiplier=cfg.watermark.inference_scale)
        imgs = generators[res](params, ids, neg, kgen, 7.5, diag)
        imgs01 = (imgs + 1.0) / 2.0
        dparams, batch_stats, opt_state, metrics = dec_step(
            dparams, batch_stats, opt_state, imgs01, msg, kstep)
        if step_i % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            history.append(m)
            tracker.log(m, step_i)
            print(f"step {step_i}/{max_steps} res={res}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                  + f" ({(time.time()-t0)/max(1, step_i - start_step):.2f}"
                  "s/step)", flush=True)
        if step_i % args.checkpointing_steps == 0:
            # orbax save is a cross-process collective (see ppft_train)
            ckpt.save(step_i, {"dparams": dparams, "batch_stats": batch_stats,
                               "opt_state": opt_state, "step": step_i})

    if sh.is_main_process():
        from aqualora_tpu.core.checkpoint import save_pytree
        save_pytree(os.path.join(args.output_dir, "msgdecoder"),
                    {"params": dparams, "batch_stats": batch_stats})
    ckpt.close()
    tracker.close()
    return {"dparams": dparams, "batch_stats": batch_stats,
            "history": history}


def build_argparser() -> argparse.ArgumentParser:
    p = ppft_argparser()
    p.description = __doc__
    p.set_defaults(learning_rate=5e-6, msg_bits=48)
    return p


def main():
    args = build_argparser().parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)
    run(args)


if __name__ == "__main__":
    main()
