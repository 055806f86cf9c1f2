"""Stage 2 — PPFT (Prior-Preserving Fine-Tuning), the heart of AquaLoRA.

TPU-native re-implementation of `train/ppft_train.py`: rank-R LoRA on all
192 U-Net modules + MapperNet are trained so that the U-Net *with the
watermark in its input and the LoRA on* predicts exactly what the clean
model predicts on clean input (`ppft_train.py:987-1068`):

    teacher = unet(add_noise(z, eps, t),        scale=0)     [stop-grad]
    student = unet(add_noise(z + wm(msg), eps, t), scale=mapper(msg))
    loss    = MSE(student, teacher)

which simultaneously teaches the LoRA to *produce* the latent watermark
and to *preserve the prior*.  Teacher and student share one jitted
program here (the diag scale is a traced argument — no monkey-patching,
no separate graphs).

Parallelism: batch sharded over the mesh data axis, params replicated;
XLA emits the grad all-reduce over ICI (replaces accelerate/NCCL DDP,
`ppft_train.py:479-484,904-912`).  Optimizer: AdamW(5e-4 default, README
uses 1e-4) on [LoRA params (grad-clipped at 1.0) + mapper], cosine
schedule with warmup and lr_end floor (`utils/misc.py:23-33`), optional
gradient accumulation via optax.MultiSteps.
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import os
import time
from typing import Any, Dict, Tuple

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqualora_tpu.core import io
from aqualora_tpu.core import sharding as sh
from aqualora_tpu.core.checkpoint import CheckpointManager, load_pytree, save_pytree
from aqualora_tpu.core.config import (EfficientNetConfig, PipelineConfig,
                                      WatermarkConfig)
from aqualora_tpu.core.tokenizer import load_tokenizer
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.models.watermark import SecretDecoder, SecretEncoder
from aqualora_tpu.train import data as data_lib
from aqualora_tpu.train.losses import bit_accuracy


# ---------------------------------------------------------------------------
# param partitioning: LoRA subtree is the trainable unet part
# ---------------------------------------------------------------------------

def split_lora(unet_params: Dict) -> Tuple[Dict, Dict]:
    """-> (base_flat, lora_flat) by path membership of a 'lora' component."""
    flat = tu.flatten_dict(unet_params)
    lora = {k: v for k, v in flat.items() if "lora" in k}
    base = {k: v for k, v in flat.items() if "lora" not in k}
    return base, lora


def merge_lora(base_flat: Dict, lora_flat: Dict) -> Dict:
    return tu.unflatten_dict({**base_flat, **lora_flat})


def cosine_with_warmup_lr_end(base_lr: float, warmup: int, total: int,
                              lr_end: float, num_cycles: float = 0.5):
    """utils/misc.py:23-33 — lr_end is a *fraction* of the base LR."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup)
        progress = (step - warmup) / jnp.maximum(1.0, total - warmup)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        return base_lr * jnp.where(step < warmup, warm,
                                   jnp.maximum(lr_end, cos))

    return fn


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------

def make_loss_fn(pipe: StableDiffusionPipeline, sec_encoder: SecretEncoder,
                 msg_bits: int, train_text_encoder: bool = False,
                 rank_dropout: float = 0.0, teacher_skip_lora: bool = True,
                 teacher_attn_impl: str | None = None,
                 teacher_int8: bool = False,
                 cache_latents: bool = False):
    """The PPFT objective (ppft_train.py:987-1051) as a standalone
    function — shared by make_train_step and scripts/bench_train.py's
    in-loop measurement.

    cache_latents: `pixels` arrives as pre-computed VAE posterior moments
    [B, h, w, 2C] (mean || clipped logvar, data.CachedMomentsDataset) and
    the frozen VAE encoder is skipped.  EXACT reference semantics: the
    encoder is deterministic, and the posterior *sampling* noise stays in
    the step (fresh draw every time an image is revisited, same as
    `vae.encode(...).sample()` per step, ppft_train.py:993)."""
    schedule = pipe.schedule
    v_pred = pipe.config.unet.prediction_type == "v_prediction"
    scaling = pipe.config.vae.scaling_factor

    def loss_fn(trainable, base_flat, frozen, pixels, input_ids, key):
        kmsg, kvae, knoise, kt, krd, kld, kte = jax.random.split(key, 7)
        b = pixels.shape[0]
        msg = jax.random.bernoulli(kmsg, 0.5, (b, msg_bits)).astype(jnp.float32)
        diag = pipe.mapper.apply({"params": trainable["mapper"]}, msg)
        if rank_dropout > 0.0:
            # kohya rank dropout folded into the traced scale
            from aqualora_tpu.train.block_lr import rank_dropout_scale
            diag = rank_dropout_scale(krd, diag, rank_dropout)

        if cache_latents:
            # mirror vae.sample in the pipeline compute dtype: a f32 latent
            # here would silently promote the whole U-Net to f32 (measured
            # 6x on-chip — docs/PERFORMANCE.md cache_latents entry)
            mean, logvar = jnp.split(pixels.astype(pipe.dtype), 2, axis=-1)
            latents = pipe.vae.sample_from_moments(
                mean, logvar, jax.random.normal(kvae, mean.shape, mean.dtype))
        else:
            latents = pipe.vae.apply({"params": frozen["vae"]}, pixels, kvae,
                                     method="sample")
        grid = pipe.config.watermark.secret_grid
        if latents.shape[1] == latents.shape[2] == 2 * grid:
            # fused Pallas injection (ops/secret_inject.py): latent + wm(msg)
            from aqualora_tpu.ops.secret_inject import inject_from_params
            injected = inject_from_params(frozen["sec_encoder"], latents,
                                          msg, grid)
        else:
            injected, _ = sec_encoder.apply(
                {"params": frozen["sec_encoder"]}, latents, msg)
        wm_input = jax.lax.stop_gradient(injected) * scaling
        model_input = latents * scaling

        noise = jax.random.normal(knoise, model_input.shape)
        t = jax.random.randint(kt, (b,), 0,
                               schedule.config.num_train_timesteps)
        noisy_clean = schedule.add_noise(model_input, noise, t)
        noisy_wm = schedule.add_noise(wm_input, noise, t)

        if train_text_encoder:
            te_params = merge_lora(frozen["text_encoder_base"],
                                   tu.flatten_dict(trainable["te_lora"]))
            # same dropout rng collection as the student U-Net: the TE
            # LoRA gets kohya module/elementwise dropout when configured.
            # DELIBERATE: this ctx (TE-LoRA active) feeds BOTH the
            # stop-gradient teacher and the student below — the reference
            # computes encoder_hidden_states once from the LoRA-patched
            # text encoder and passes it to both passes
            # (ppft_train.py:1014-1035); only the U-Net LoRA is switched
            # off (scale=0) in the teacher.
            ctx = pipe.clip.apply({"params": te_params}, input_ids, 1.0,
                                  rngs={"lora_dropout": kte})
        else:
            ctx = pipe.clip.apply({"params": frozen["text_encoder"]},
                                  input_ids)

        unet_params = merge_lora(base_flat, tu.flatten_dict(trainable["lora"]))
        # teacher runs scale=None (LoRA branches skipped entirely) — exactly
        # equivalent to the reference's scale=0 (ppft_train.py:1026-1029,
        # diag output is multiplied by the scale) but saves the rank-320
        # down/up matmuls on all 192 sites in the no-grad pass.  The
        # teacher has no backward, so it may also use the fwd-fastest
        # attention (SDPA) while the student keeps the Pallas flash
        # kernel for its O(T)-memory backward.
        from aqualora_tpu.ops.attention import attention_impl
        t_scale = None if teacher_skip_lora else jnp.zeros_like(diag)
        t_ctx = (attention_impl(teacher_attn_impl) if teacher_attn_impl
                 else contextlib.nullcontext())
        t_params = unet_params
        if teacher_int8:
            # int8-conv teacher (--teacher_int8, ops/quant.py): the
            # teacher pass (reference ppft_train.py:1026-1029) is
            # stop-gradient over frozen base kernels, so the usual
            # quantization-gradient objection does not apply.  Quantized
            # IN-GRAPH each step — a memory-bound sweep over the conv
            # kernels (~ms) — so no second device-resident U-Net copy and
            # no extra step argument.  It slightly changes the objective
            # (teacher logits move by the quantization error); measured
            # loss delta + throughput in docs/PERFORMANCE.md before any
            # defaulting.
            from aqualora_tpu.ops.quant import quantize_unet_params_int8
            t_params = quantize_unet_params_int8(
                unet_params, include_convs=True, include_dense=False)
        with t_ctx:
            teacher = jax.lax.stop_gradient(
                pipe.unet.apply({"params": t_params}, noisy_clean, t,
                                ctx, t_scale))
        # the 'lora_dropout' rng arms the kohya module/elementwise dropouts
        # (models/lora.py; inert when the config probs are 0).  Teacher
        # stays dropout-free (it runs scale=None / no-grad).
        student = pipe.unet.apply({"params": unet_params}, noisy_wm, t, ctx,
                                  diag, rngs={"lora_dropout": kld})
        if v_pred:
            student = schedule.velocity_to_epsilon(student, noisy_wm, t)
            teacher = schedule.velocity_to_epsilon(teacher, noisy_clean, t)
        loss = jnp.mean((student.astype(jnp.float32)
                         - teacher.astype(jnp.float32)) ** 2)
        return loss, {"ppft_loss": loss}

    return loss_fn


def make_train_step(pipe: StableDiffusionPipeline, sec_encoder: SecretEncoder,
                    optimizer, msg_bits: int, train_text_encoder: bool = False,
                    rank_dropout: float = 0.0, teacher_skip_lora: bool = True,
                    teacher_attn_impl: str | None = None,
                    teacher_int8: bool = False,
                    cache_latents: bool = False):
    loss_fn = make_loss_fn(pipe, sec_encoder, msg_bits, train_text_encoder,
                           rank_dropout, teacher_skip_lora,
                           teacher_attn_impl, teacher_int8=teacher_int8,
                           cache_latents=cache_latents)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(trainable, opt_state, base_flat, frozen, pixels,
                   input_ids, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, base_flat, frozen, pixels, input_ids, key)
        # pre-update global grad norm: the reference logs it implicitly via
        # clip_grad_norm_ (ppft_train.py:1059-1065); here it also certifies
        # that the ICI grad all-reduce carries non-zero numerics
        # (the multi-chip dryrun asserts on it).
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def build_configs(args) -> Tuple[PipelineConfig, EfficientNetConfig, int]:
    import dataclasses as dc
    mapper_std = getattr(args, "mapper_std", 1.0)
    if getattr(args, "tiny", False):
        cfg = PipelineConfig.tiny()
        if mapper_std != 1.0:
            cfg = dc.replace(cfg, watermark=dc.replace(
                cfg.watermark, mapper_std=mapper_std))
        res, backbone = 64, EfficientNetConfig.tiny()
    else:
        cfg = PipelineConfig.sd15(args.rank)
        cfg = PipelineConfig(**{**cfg.__dict__,
                                "watermark": WatermarkConfig(
                                    msg_bits=args.msg_bits,
                                    lora_rank=args.rank,
                                    mapper_std=mapper_std)})
        res, backbone = args.resolution, EfficientNetConfig.b1()
    if getattr(args, "gradient_checkpointing", False):
        cfg = dc.replace(cfg, unet=dc.replace(cfg.unet, remat=True))
    if getattr(args, "train_text_encoder", False):
        cfg = dc.replace(cfg, clip=cfg.clip.with_lora(args.rank))
    md = getattr(args, "module_dropout", 0.0) or 0.0
    ld = getattr(args, "lora_dropout", 0.0) or 0.0
    if md > 0.0 or ld > 0.0:
        # kohya network dropouts apply to EVERY LoRA module, text encoder
        # included when it is being trained (lib/lora.py:89-97)
        cfg = dc.replace(cfg, unet=dc.replace(
            cfg.unet, lora=dc.replace(cfg.unet.lora, module_dropout=md,
                                      dropout=ld)))
        if cfg.clip.lora and cfg.clip.lora.enabled:
            cfg = dc.replace(cfg, clip=dc.replace(
                cfg.clip, lora=dc.replace(cfg.clip.lora, module_dropout=md,
                                          dropout=ld)))
    return cfg, backbone, res


def run(args: argparse.Namespace) -> Dict[str, Any]:
    impl = getattr(args, "attention_impl", "auto")
    if impl == "auto" and jax.default_backend() == "tpu":
        # measured (docs/PERFORMANCE.md): for TRAINING the Pallas flash
        # kernel beats XLA SDPA even at d=40 (0.438 vs 0.703 s/step at B8)
        # because its backward recomputes in VMEM instead of re-reading the
        # O(T^2) logits from HBM — and it frees ~9 GB, enabling batch 16+.
        impl = "flash"
    if impl != "auto":
        os.environ["AQUALORA_ATTN_IMPL"] = impl
    cfg, backbone, resolution = build_configs(args)
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    pipe = StableDiffusionPipeline(cfg, dtype=dtype)
    latent_res = resolution // cfg.vae.downscale
    sec_encoder = SecretEncoder(cfg.watermark.msg_bits,
                                cfg.watermark.secret_grid, latent_res,
                                cfg.vae.latent_channels)
    msgdecoder = SecretDecoder(cfg.watermark.msg_bits, backbone)

    key = jax.random.PRNGKey(args.seed or 0)
    kinit, key = jax.random.split(key)
    params = pipe.init_params(kinit, height=resolution, width=resolution)
    if args.pretrained_model_name_or_path:
        params = _load_sd_checkpoint(args.pretrained_model_name_or_path, params)

    dummy_lat = jnp.zeros((1, latent_res, latent_res, cfg.vae.latent_channels))
    dummy_msg = jnp.zeros((1, cfg.watermark.msg_bits))
    kse, kdec, key = jax.random.split(key, 3)
    sec_encoder_params = sec_encoder.init(kse, dummy_lat, dummy_msg)["params"]
    dec_vars = msgdecoder.init(
        kdec, jnp.zeros((1, resolution, resolution, 3)))
    msgdecoder_vars = {"params": dec_vars["params"],
                       "batch_stats": dec_vars.get("batch_stats", {})}
    if args.start_from_pretrain:
        pre = load_pytree(args.start_from_pretrain,
                          {"sec_encoder": sec_encoder_params,
                           "sec_decoder": msgdecoder_vars})
        sec_encoder_params = pre["sec_encoder"]
        msgdecoder_vars = pre["sec_decoder"]

    base_flat, lora_flat = split_lora(params["unet"])
    if args.resume_from_lora:
        lora_path = os.path.join(args.resume_from_lora,
                                 "pytorch_lora_weights.safetensors")
        lora_state = io.load_safetensors(lora_path)
        merged = io.import_lora_safetensors(
            tu.unflatten_dict({**base_flat, **lora_flat}), cfg.unet,
            lora_state)
        _, lora_flat = split_lora(merged)
        if (args.train_text_encoder
                and any(k.startswith("text_encoder.") for k in lora_state)):
            # resume the te-LoRA trained by a prior --train_text_encoder run
            # (reference keeps te keys on resume, drops them only on fold —
            # scripts/create_wm_lora.py:38-39)
            params["text_encoder"] = io.import_te_lora_safetensors(
                params["text_encoder"], cfg.clip, lora_state)
        mapper_state = io.load_safetensors(
            os.path.join(args.resume_from_lora, "mapper.safetensors"))
        params["mapper"] = {"bit_embeddings":
                            np.asarray(mapper_state["bit_embeddings.weight"])}

    trainable = {"lora": tu.unflatten_dict(lora_flat),
                 "mapper": params["mapper"]}
    frozen = {"vae": params["vae"], "text_encoder": params["text_encoder"],
              "sec_encoder": sec_encoder_params}
    if args.train_text_encoder:
        te_base, te_lora = split_lora(params["text_encoder"])
        trainable["te_lora"] = tu.unflatten_dict(te_lora)
        frozen["text_encoder_base"] = te_base

    dataset = data_lib.make_dataset(args.train_data_dir, resolution,
                                    dataset_name=args.dataset_name,
                                    max_samples=args.max_train_samples,
                                    center_crop=args.center_crop,
                                    random_flip=args.random_flip,
                                    caption_column=args.caption_column,
                                    image_column=args.image_column,
                                    config_name=args.dataset_config_name,
                                    num_threads=args.dataloader_num_workers)
    steps_per_epoch = max(1, len(dataset) //
                          (args.train_batch_size * jax.process_count()))
    cache_latents = getattr(args, "cache_latents", False)
    if cache_latents:
        if args.random_flip:
            raise ValueError("--cache_latents cannot be combined with "
                             "--random_flip (the cache is per-sample; "
                             "kohya imposes the same restriction)")
        # VAE params as an ARGUMENT, not a closure: baked-in trees become
        # jaxpr constants (slow lowering; the tunnel's remote compiler
        # rejects GB-scale constant programs outright — CLAUDE.md)
        enc = jax.jit(lambda v, x: jnp.concatenate(
            pipe.vae.apply({"params": v}, x,
                           method="encode_moments"), axis=-1))
        vae_dev = jax.device_put(params["vae"])
        t_cache = time.time()
        dataset = data_lib.CachedMomentsDataset.build(
            dataset, lambda x: enc(vae_dev, jnp.asarray(x)),
            args.train_batch_size,
            seed=args.seed or 0, process_index=jax.process_index(),
            process_count=jax.process_count())
        print(f"cached VAE moments for {len(dataset)} samples "
              f"({dataset.moments.nbytes / 1e6:.0f} MB host, "
              f"{time.time() - t_cache:.1f}s)", flush=True)
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

    lr = args.learning_rate
    if args.scale_lr:   # ppft_train.py:755-758
        lr *= (args.gradient_accumulation_steps * args.train_batch_size
               * jax.process_count())
    lr_fn = cosine_with_warmup_lr_end(lr, args.lr_warmup_steps, max_steps,
                                      args.lr_end)
    if args.use_8bit_adam:
        # reference: bitsandbytes AdamW8bit (ppft_train.py:760-771);
        # TPU-native equivalent with int8 blockwise moment storage
        from aqualora_tpu.train.adamw8bit import adamw8bit
        adamw = lambda: adamw8bit(lr_fn, b1=args.adam_beta1,
                                  b2=args.adam_beta2, eps=args.adam_epsilon,
                                  weight_decay=args.adam_weight_decay)
    else:
        adamw = lambda: optax.adamw(lr_fn, b1=args.adam_beta1,
                                    b2=args.adam_beta2, eps=args.adam_epsilon,
                                    weight_decay=args.adam_weight_decay)
    # LoRA params (unet + optional text encoder) are grad-clipped together
    # (ppft_train.py:1059-1065 clips params_to_clip only, not the mapper)
    labels = {"lora": "lora", "mapper": "mapper"}
    lora_chain = [optax.clip_by_global_norm(args.max_grad_norm), adamw()]
    blw = [getattr(args, k, None) for k in
           ("down_lr_weight", "mid_lr_weight", "up_lr_weight")]
    if any(w is not None for w in blw):
        # kohya block-wise LR (lib/lora.py:559-680) as an update scaler
        from aqualora_tpu.train.block_lr import (parse_lr_weight_list,
                                                 scale_lora_updates_by_block)
        down = parse_lr_weight_list(blw[0])
        mid = float(blw[1]) if blw[1] is not None else None
        up = parse_lr_weight_list(blw[2])
        lora_chain.append(scale_lora_updates_by_block(
            down, mid, up, getattr(args, "block_lr_zero_threshold", 0.0)))
        print(f"block-wise LR: down={down} mid={mid} up={up}")
    chains = {"lora": optax.chain(*lora_chain), "mapper": adamw()}
    if args.train_text_encoder:
        labels["te_lora"] = "lora"
    tx = optax.multi_transform(chains, labels)
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    opt_state = tx.init(trainable)

    train_step = make_train_step(pipe, sec_encoder, tx,
                                 cfg.watermark.msg_bits,
                                 train_text_encoder=args.train_text_encoder,
                                 rank_dropout=getattr(args, "rank_dropout",
                                                      0.0),
                                 teacher_skip_lora=getattr(
                                     args, "teacher_skip_lora", 1) != 0,
                                 teacher_int8=getattr(args, "teacher_int8",
                                                      False),
                                 cache_latents=cache_latents)
    tokenizer = load_tokenizer(args.tokenizer_vocab, vocab_size=cfg.clip.vocab_size)

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             max_to_keep=args.checkpoints_total_limit)
    global_step = 0
    if args.resume_from_checkpoint:
        step = (None if args.resume_from_checkpoint == "latest"
                else int(args.resume_from_checkpoint))
        state = ckpt.restore({"trainable": trainable, "opt_state": opt_state,
                              "step": 0}, step)
        trainable, opt_state = state["trainable"], state["opt_state"]
        global_step = int(state["step"])

    mesh = sh.make_data_mesh(args.train_batch_size)
    # replicate the training state on the mesh (orbax restore commits
    # arrays to one device, which conflicts with batch-sharded inputs)
    trainable = sh.replicate(mesh, trainable)
    if getattr(args, "fsdp", False) and mesh.shape[sh.DATA_AXIS] > 1:
        # ZeRO-1 / weight-FSDP over the data axis: optimizer moments and
        # the frozen weights (U-Net base + VAE/CLIP/secret-encoder towers,
        # the bulk of HBM at rank 320) live sharded; GSPMD all-gathers
        # each layer at its use point and reduce-scatters the grads.
        # Trainable LoRA/mapper params stay replicated (they are the
        # small fast-moving set and the artifact-save path reads them
        # whole).  No counterpart in the reference (accelerate DDP
        # replicates everything, train/ppft_train.py:479-484).
        opt_state = sh.shard_fsdp(mesh, opt_state)
        base_flat = sh.shard_fsdp(mesh, base_flat)
        frozen = sh.shard_fsdp(mesh, frozen)
    else:
        opt_state = sh.replicate(mesh, opt_state)
        # frozen towers + U-Net base too: checkpoint loads leave host-numpy
        # leaves that would re-upload per step otherwise
        base_flat = sh.replicate(mesh, base_flat)
        frozen = sh.replicate(mesh, frozen)
    from aqualora_tpu.utils.logging import Tracker
    tracker = Tracker(args.output_dir, args.report_to)
    history = []
    t0 = time.time()
    epoch = 0
    data_iter = data_lib.prefetch(dataset.batches(
        args.train_batch_size, seed=args.seed or 0,
        process_index=jax.process_index(),
        process_count=jax.process_count()))
    # resumed-step replay: fast-forward the stream so data order continues
    # where it left off (the reference's skip loop, ppft_train.py:981-985)
    for _ in range(global_step):
        next(data_iter)
    while global_step < max_steps:
        pixels, captions = next(data_iter)
        ids = jnp.asarray(tokenizer(captions if captions else
                                    [""] * len(pixels)))
        pixels = sh.shard_batch(mesh, jnp.asarray(pixels))
        key, sub = jax.random.split(key)
        trainable, opt_state, metrics = train_step(
            trainable, opt_state, base_flat, frozen, pixels, ids, sub)
        global_step += 1
        if global_step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            history.append(m)
            m["lr"] = float(lr_fn(global_step))
            tracker.log(m, global_step)
            print(f"step {global_step}/{max_steps}: "
                  + " ".join(f"{k}={v:.6f}" for k, v in m.items())
                  + f" ({(time.time()-t0)/global_step:.2f}s/step)", flush=True)
        if global_step % args.checkpointing_steps == 0:
            # orbax save is a cross-process collective: with --fsdp (or any
            # multi-host mesh) every process holds shards and must
            # participate — a main-only guard would hang the save.
            ckpt.save(global_step, {"trainable": trainable,
                                    "opt_state": opt_state,
                                    "step": global_step})
        epoch = global_step // steps_per_epoch
        due_epoch = (args.validation_epochs and global_step %
                     (steps_per_epoch * args.validation_epochs) == 0)
        due_step = (getattr(args, "validation_steps", 0)
                    and global_step % args.validation_steps == 0)
        if due_epoch or due_step:
            # split a key OFF the chain — handing the live chain key to
            # validate would make the next train step reuse the same
            # PRNG material validation just consumed
            key, vkey = jax.random.split(key)
            acc = validate(pipe, msgdecoder, sec_encoder, params, frozen,
                           trainable, base_flat, msgdecoder_vars, tokenizer,
                           args, vkey, tracker, global_step)
            tracker.log({"validation_accuracy": acc}, global_step)
            print(f"epoch {epoch} step {global_step}: "
                  f"validation_accuracy {acc:.4f}", flush=True)

    # final artifacts (ppft_train.py:1203-1229): LoRA safetensors + mapper +
    # msgdecoder, in the reference's layouts.
    if sh.is_main_process():
        save_artifacts(args.output_dir, cfg, trainable, base_flat,
                       msgdecoder_vars)
        # final sanity inference (ppft_train.py:1231-1276): reload the just-
        # saved LoRA, generate with it, decode, and log under "test".
        if args.validation_prompt and args.num_validation_images > 0:
            acc = final_sanity_inference(
                pipe, msgdecoder, trainable, params, base_flat,
                msgdecoder_vars, tokenizer, args, key, tracker, epoch)
            print(f"final sanity inference: bit_accuracy {acc:.4f}",
                  flush=True)
    ckpt.close()
    tracker.close()
    # the train step donates `trainable`; rebuild the full param tree from
    # the live buffers (the pre-training aliases inside `params` are dead)
    params = dict(params)
    params["unet"] = merge_lora(base_flat, tu.flatten_dict(trainable["lora"]))
    params["mapper"] = trainable["mapper"]
    return {"trainable": trainable, "history": history,
            "base_flat": base_flat, "frozen": frozen,
            "msgdecoder_vars": msgdecoder_vars, "pipe": pipe,
            "params": params}


def save_artifacts(output_dir, cfg, trainable, base_flat, msgdecoder_vars):
    os.makedirs(output_dir, exist_ok=True)
    unet_params = merge_lora(base_flat, tu.flatten_dict(trainable["lora"]))
    state = io.export_lora_safetensors(unet_params, cfg.unet)
    if "te_lora" in trainable:
        # the reference saves the te-LoRA into the same safetensors
        # (ppft_train.py:1210-1221 via CustomLoraLoaderMixin.save_lora_weights)
        state.update(io.export_te_lora_safetensors(trainable["te_lora"],
                                                   cfg.clip))
    io.save_safetensors(
        state, os.path.join(output_dir, "pytorch_lora_weights.safetensors"))
    io.save_safetensors(
        {"bit_embeddings.weight":
         np.asarray(trainable["mapper"]["bit_embeddings"])},
        os.path.join(output_dir, "mapper.safetensors"))
    save_pytree(os.path.join(output_dir, "msgdecoder"), msgdecoder_vars)


def validate(pipe, msgdecoder, sec_encoder, params, frozen, trainable,
             base_flat, msgdecoder_vars, tokenizer, args, key,
             tracker=None, step=0):
    """Generation + decode validation (ppft_train.py:1112-1201), using the
    dpms_m sampler like the reference's DPMSolver++ validation pipeline;
    validation images go to the tracker (`:1186-1198`)."""
    cfg = pipe.config
    tiny = getattr(args, "tiny", False)
    res = getattr(args, "validation_resolution", None) or (
        64 if tiny else args.resolution)
    steps = getattr(args, "validation_num_inference_steps", None) or (
        2 if tiny else 25)
    gen = pipe.make_generate(num_steps=steps, sampler="dpms_m",
                             height=res, width=res)
    kmsg, kgen = jax.random.split(key)
    n = max(1, getattr(args, "num_validation_images", 1))
    msg = jax.random.bernoulli(kmsg, 0.5,
                               (n, cfg.watermark.msg_bits)).astype(jnp.float32)
    gen_params = dict(params)
    gen_params["unet"] = merge_lora(base_flat,
                                    tu.flatten_dict(trainable["lora"]))
    gen_params["mapper"] = trainable["mapper"]
    # frozen towers from the DEVICE-resident tree: `params` still holds
    # the host-numpy checkpoint leaves, which re-upload through the
    # tunnel on every validation call (CLAUDE.md device_put rule) — and
    # with --train_text_encoder the CURRENT te-LoRA must condition the
    # validation generation, not the initial one
    gen_params["vae"] = frozen["vae"]
    gen_params["text_encoder"] = (
        merge_lora(frozen["text_encoder_base"],
                   tu.flatten_dict(trainable["te_lora"]))
        if "te_lora" in trainable else frozen["text_encoder"])
    diag = pipe.message_scale(gen_params, msg, multiplier=1.0)
    prompt = args.validation_prompt or "a photo"
    ids = jnp.asarray(tokenizer([prompt] * n))
    neg = jnp.asarray(tokenizer([""] * n))
    from aqualora_tpu.ops.attention import attention_impl
    with attention_impl("auto"):
        # serving per-shape policy for the generation trace: run() sets
        # AQUALORA_ATTN_IMPL=flash process-wide for the TRAIN step, but
        # forcing flash at all serving levels measures -22% (the d=40
        # levels lose 2x — docs/PERFORMANCE.md)
        imgs = gen(gen_params, ids, neg, kgen, 7.5, diag)
    if tracker is not None:
        tracker.log_images("validation", np.asarray(imgs), step)
    logits = msgdecoder.apply(
        {"params": msgdecoder_vars["params"],
         "batch_stats": msgdecoder_vars["batch_stats"]}, imgs, False)
    return float(bit_accuracy(logits, msg))


def final_sanity_inference(pipe, msgdecoder, trainable, params, base_flat,
                           msgdecoder_vars, tokenizer, args, key,
                           tracker=None, epoch=0):
    """End-of-training sanity inference (ppft_train.py:1231-1276): the
    reference reloads the just-saved LoRA into a fresh pipeline and
    generates `num_validation_images` from `validation_prompt`, logging
    them under "test".  Here the saved artifacts (LoRA safetensors +
    mapper) are read back from disk — certifying the export->import round
    trip — then generation + decode run on the reloaded weights."""
    cfg = pipe.config
    state = io.load_safetensors(
        os.path.join(args.output_dir, "pytorch_lora_weights.safetensors"))
    template = merge_lora(base_flat, tu.flatten_dict(trainable["lora"]))
    gen_params = dict(params)
    gen_params["unet"] = io.import_lora_safetensors(template, cfg.unet, state)
    if any(k.startswith("text_encoder.") for k in state):
        gen_params["text_encoder"] = io.import_te_lora_safetensors(
            params["text_encoder"], cfg.clip, state)
    mapper_state = io.load_safetensors(
        os.path.join(args.output_dir, "mapper.safetensors"))
    gen_params["mapper"] = {"bit_embeddings":
                            np.asarray(mapper_state["bit_embeddings.weight"])}

    res = 64 if getattr(args, "tiny", False) else args.resolution
    steps = 2 if getattr(args, "tiny", False) else 25
    gen = pipe.make_generate(num_steps=steps, sampler="dpms_m",
                             height=res, width=res)
    kmsg, kgen = jax.random.split(key)
    n = args.num_validation_images
    msg = jax.random.bernoulli(
        kmsg, 0.5, (n, cfg.watermark.msg_bits)).astype(jnp.float32)
    diag = pipe.message_scale(gen_params, msg, multiplier=1.0)
    ids = jnp.asarray(tokenizer([args.validation_prompt] * n))
    neg = jnp.asarray(tokenizer([""] * n))
    from aqualora_tpu.ops.attention import attention_impl
    with attention_impl("auto"):       # serving policy, not the training
        imgs = gen(gen_params, ids, neg, kgen, 7.5, diag)   # flash override
    if tracker is not None:
        tracker.log_images("test", np.asarray(imgs), epoch)
    logits = msgdecoder.apply(
        {"params": msgdecoder_vars["params"],
         "batch_stats": msgdecoder_vars["batch_stats"]}, imgs, False)
    return float(bit_accuracy(logits, msg))


def _load_sd_checkpoint(path: str, params: Dict) -> Dict:
    """Load a diffusers-layout SD checkpoint directory."""
    subdirs = {"unet": "unet/diffusion_pytorch_model.safetensors",
               "vae": "vae/diffusion_pytorch_model.safetensors",
               "text_encoder": "text_encoder/model.safetensors"}
    out = dict(params)
    for name, sub in subdirs.items():
        p = os.path.join(path, sub)
        if not os.path.isfile(p):
            raise FileNotFoundError(f"missing {p}")
        state = io.load_safetensors(p)
        if name == "text_encoder":
            state = {k[len("text_model."):] if k.startswith("text_model.")
                     else k: v for k, v in state.items()}
            state = {k.replace("embeddings.", "").replace("encoder.", ""): v
                     for k, v in state.items()}
            state = {k: v for k, v in state.items()
                     if "position_ids" not in k}
        tree = io.torch_state_to_flax_params(state)
        if name == "unet":
            base, lora = split_lora(out["unet"])
            loaded = tu.flatten_dict(tree)
            out["unet"] = tu.unflatten_dict(
                {**{k: io_assign(base[k], loaded[k]) for k in base}, **lora})
        else:
            out[name] = io.assign_into(out[name], tree)
    return out


def io_assign(tmpl, val):
    val = np.asarray(val)
    if tuple(val.shape) != tuple(np.shape(tmpl)):
        raise ValueError(f"shape {val.shape} vs {np.shape(tmpl)}")
    return val.astype(np.asarray(tmpl).dtype)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (ppft_train.py:116-425, subset that is functional here)
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--train_data_dir", type=str, default=None)
    p.add_argument("--dataset_name", type=str, default=None)
    p.add_argument("--dataset_config_name", type=str, default=None)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--num_validation_images", type=int, default=1)
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--image_column", type=str, default="image")
    p.add_argument("--caption_column", type=str, default="text")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_end", type=float, default=0.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--rank", type=int, default=4)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--mapper_std", type=float, default=1.0)
    p.add_argument("--output_dir", type=str, default="ppft-output")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--start_from_pretrain", type=str, default=None)
    p.add_argument("--resume_from_lora", type=str, default=None)
    p.add_argument("--validation_prompt", type=str, default=None)
    p.add_argument("--validation_epochs", type=int, default=1)
    p.add_argument("--validation_steps", type=int, default=0,
                   help="also validate every N optimizer steps (0 = only "
                        "per --validation_epochs); keeps long runs "
                        "observable without per-epoch stalls")
    p.add_argument("--validation_resolution", type=int, default=None,
                   help="validate at a smaller resolution than training "
                        "(cuts the inline 25-step generation cost)")
    p.add_argument("--validation_num_inference_steps", type=int,
                   default=None)
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["no", "bf16", "fp16"])
    p.add_argument("--report_to", type=str, default="tensorboard",
                   choices=["tensorboard", "wandb", "all", "none"])
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="int8 blockwise optimizer moments "
                        "(train/adamw8bit.py; bnb AdamW8bit equivalent)")
    # kohya LoRANetwork training extras (scripts/lib/lora.py)
    p.add_argument("--teacher_skip_lora", type=int, default=1,
                   help="1 (default): teacher pass skips the LoRA branches "
                        "(exact at scale 0, ~10%% faster at batch 8). Set 0 "
                        "near the HBM ceiling (batch >= 16 on 16 GB): the "
                        "second U-Net graph variant triggers an XLA spill "
                        "cliff there (measured 4.9x, docs/PERFORMANCE.md)")
    p.add_argument("--teacher_int8", action="store_true",
                   help="run the no-grad teacher pass with int8 convs "
                        "(ops/quant.py w8a8, quantized in-graph). Changes "
                        "the objective by the teacher's quantization "
                        "error — see docs/PERFORMANCE.md for the measured "
                        "loss delta before enabling")
    p.add_argument("--int8_gen", action="store_true",
                   help="stage 3 only: quantize the frozen U-Net's conv "
                        "kernels to int8 once after setup, so the no-grad "
                        "20-step DPM++ generation loop runs the promoted "
                        "int8-conv serving config (ops/quant.py)")
    # accepted for reference CLI compatibility; the reference declares
    # them but its training loop ignores them too (ppft_train.py:311-331
    # vs :896 — the schedule is ALWAYS cosine_with_warmup_lr_end), and
    # --local_rank is torch-DDP launcher machinery replaced by the mesh
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   help="inert (reference parity: schedule is always "
                        "cosine-with-warmup-lr-end)")
    p.add_argument("--lr_power", type=float, default=1.0,
                   help="inert (reference parity)")
    p.add_argument("--local_rank", type=int, default=-1,
                   help="inert (DDP launcher arg; SPMD mesh replaces it)")
    p.add_argument("--rank_dropout", type=float, default=0.0,
                   help="kohya rank dropout (lib/lora.py:101-112), folded "
                        "into the traced diag scale")
    p.add_argument("--module_dropout", type=float, default=0.0,
                   help="kohya module dropout (lib/lora.py:89-91): drop "
                        "each LoRA site's whole delta with prob p per step")
    p.add_argument("--lora_dropout", type=float, default=0.0,
                   help="kohya plain dropout on the LoRA down activations "
                        "(lib/lora.py:96-97)")
    p.add_argument("--down_lr_weight", type=str, default=None,
                   help="block-wise LR for down blocks: preset name "
                        "(cosine/sine/linear/reverse_linear/zeros[+base]) "
                        "or 12 comma floats (lib/lora.py:559-586)")
    p.add_argument("--mid_lr_weight", type=float, default=None)
    p.add_argument("--up_lr_weight", type=str, default=None)
    p.add_argument("--block_lr_zero_threshold", type=float, default=0.0)
    p.add_argument("--allow_tf32", action="store_true",
                   help="accepted for CLI parity; TPUs use bf16 natively")
    p.add_argument("--train_text_encoder", action="store_true",
                   help="also train LoRA on the CLIP attention projections "
                        "(utils/lora_modules.py:65-146)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat the transformer blocks (ppft_train.py:602)")
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true",
                   help="accepted for CLI parity; the Pallas flash-attention "
                        "kernel is always used on TPU where shapes allow")
    p.add_argument("--scale_lr", action="store_true",
                   help="scale LR by batch*accum*devices (ppft_train.py:755)")
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=0,
                   help="native loader threads (0 = hardware concurrency)")
    p.add_argument("--cache_latents", action="store_true",
                   help="pre-encode the dataset to VAE posterior moments "
                        "once and skip the frozen VAE encoder per step "
                        "(kohya's flag of the same name; exact semantics — "
                        "the posterior sampling noise stays in the step). "
                        "Incompatible with --random_flip, like kohya")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-1/weight-FSDP: shard optimizer moments and "
                        "frozen weights over the data axis (GSPMD "
                        "all-gather at use, grad reduce-scatter); "
                        "~ (moments + frozen) / N HBM per chip on an "
                        "N-chip mesh. No-op on one device")
    # TPU-build extras
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--tokenizer_vocab", type=str, default=None)
    p.add_argument("--log_every", type=int, default=1)
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.add_argument("--attention_impl", type=str, default="auto",
                   choices=["auto", "flash", "sdpa", "xla"],
                   help="'flash' = Pallas O(T)-memory attention with the "
                        "Pallas backward — frees the O(T^2) logits that "
                        "dominate training HBM (docs/PERFORMANCE.md)")
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
