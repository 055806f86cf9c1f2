"""PPFT training-step throughput on the real chip (SD-1.5, rank-320 LoRA,
512x512, bf16 frozen towers + f32 trainables, remat on).

The reference trains at batch 12 on an A6000 (train/README.md:34-49);
this measures our samples/sec for the same two-U-Net-pass step.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.traverse_util as tu
import numpy as np
import optax

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.models.watermark import SecretEncoder
from aqualora_tpu.train.ppft_train import make_train_step, split_lora


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    # measured: remat costs 6x on this chip (4.22s vs 0.70s/step at B8)
    # for only ~11% FLOPs difference — default off, B8 fits in HBM
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--teacher_lora_on", action="store_true",
                    help="teacher pass computes the LoRA branches at "
                         "scale 0 (round-1 behavior) instead of skipping")
    ap.add_argument("--teacher_attn", type=str, default=None,
                    choices=["sdpa", "xla", "flash", "flash_jax", "auto"],
                    help="attention impl for the no-grad teacher pass "
                         "(student keeps --attn)")
    ap.add_argument("--teacher_int8", action="store_true",
                    help="teacher pass with int8 convs (the trainer's "
                         "--teacher_int8; in-graph quantization, no grads "
                         "flow through the teacher). Compare the printed "
                         "loss against a bf16 run with the same seed to "
                         "bound the objective shift")
    ap.add_argument("--adam8bit", action="store_true",
                    help="blockwise int8 moment storage "
                         "(train/adamw8bit.py) — frees ~1 GB at rank 320")
    ap.add_argument("--cache_latents", action="store_true",
                    help="feed pre-computed VAE posterior moments instead "
                         "of pixels (skips the frozen VAE encoder per "
                         "step; exact semantics — sampling noise stays "
                         "in-step)")
    ap.add_argument("--inloop", action="store_true",
                    help="measure N steps inside ONE jitted fori_loop "
                         "(no per-step tunnel dispatch/sync in the timed "
                         "region)")
    ap.add_argument("--attn", type=str, default="flash",
                    choices=["auto", "flash", "flash_jax", "sdpa", "xla"],
                    help="attention impl; 'flash' (Pallas, O(T) memory + "
                         "Pallas backward) frees the O(T^2) logits that "
                         "dominate training HBM")
    ap.add_argument("--model", type=str, default="sd15",
                    choices=["sd15", "sd21"],
                    help="base model family (sd21: d=64 heads, v-pred)")
    args = ap.parse_args()
    os.environ["AQUALORA_ATTN_IMPL"] = args.attn

    import dataclasses as dc
    cfg = (PipelineConfig.sd21(lora_rank=320) if args.model == "sd21"
           else PipelineConfig.sd15(lora_rank=320))
    if args.remat:
        cfg = dc.replace(cfg, unet=dc.replace(cfg.unet, remat=True))
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    params = pipe.fast_init_params(0, args.res, args.res)
    latent_res = args.res // cfg.vae.downscale
    sec = SecretEncoder(cfg.watermark.msg_bits, cfg.watermark.secret_grid,
                        latent_res, cfg.vae.latent_channels)
    sec_params = sec.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, latent_res, latent_res, 4)),
                          jnp.zeros((1, cfg.watermark.msg_bits)))["params"]

    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else jnp.asarray(x), t)
    base_flat, lora_flat = split_lora(params["unet"])
    base_flat = {k: jnp.asarray(v, jnp.bfloat16) for k, v in base_flat.items()}
    trainable = {"lora": tu.unflatten_dict(
        {k: jnp.asarray(v) for k, v in lora_flat.items()}),
        "mapper": params["mapper"]}
    frozen = {"vae": to_bf16(params["vae"]),
              "text_encoder": to_bf16(params["text_encoder"]),
              "sec_encoder": sec_params}

    if args.adam8bit:
        from aqualora_tpu.train.adamw8bit import adamw8bit
        tx = adamw8bit(1e-4)
    else:
        tx = optax.adamw(1e-4)
    opt_state = tx.init(trainable)
    step = make_train_step(pipe, sec, tx, cfg.watermark.msg_bits,
                           teacher_skip_lora=not args.teacher_lora_on,
                           teacher_attn_impl=args.teacher_attn,
                           teacher_int8=args.teacher_int8,
                           cache_latents=args.cache_latents)

    pixels = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (args.batch, args.res, args.res, 3)).astype(np.float32))
    ids = jnp.ones((args.batch, 77), jnp.int32)
    if args.cache_latents:
        # the one-time encode is NOT in the timed region (it amortizes over
        # the whole run: ~1 pass over the dataset vs every-step encodes)
        enc = jax.jit(lambda p, x: jnp.concatenate(
            pipe.vae.apply({"params": p}, x, method="encode_moments"),
            axis=-1).astype(jnp.float32))
        # f32 on the wire (the loss casts to the pipe dtype) so the +1e-6
        # input variation between timed calls survives — in bf16 it would
        # round away and the tunnel would memoize the execution
        pixels = enc(frozen["vae"], pixels)
        print(f"cached moments: {pixels.shape} {pixels.dtype}")

    # mesh-aware: shard the batch over a data mesh on multi-chip hosts
    # (a real v5e-8 runs this unchanged); 1 chip = plain path
    from aqualora_tpu.core import sharding as sh
    mesh = sh.data_mesh_or_none(args.batch)   # the one mesh-or-not home
    n_data = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        trainable = sh.replicate(mesh, trainable)
        opt_state = sh.replicate(mesh, opt_state)
        base_flat = sh.replicate(mesh, base_flat)
        frozen = sh.replicate(mesh, frozen)
        pixels, ids = sh.shard_batch(mesh, pixels), sh.shard_batch(mesh, ids)
        print(f"data mesh over {n_data} devices "
              f"(per-device batch {args.batch // n_data})")

    if args.inloop:
        # single-dispatch measurement: N steps inside one jitted fori_loop
        # (per-step host dispatch + scalar fetch through the tunnel is
        # ~0.1-0.45 s and is NOT training compute; real training logs
        # every N steps, so the in-loop number is the honest throughput)
        from aqualora_tpu.train.ppft_train import make_loss_fn
        loss_fn = make_loss_fn(pipe, sec, cfg.watermark.msg_bits,
                               teacher_skip_lora=not args.teacher_lora_on,
                               teacher_attn_impl=args.teacher_attn,
                               teacher_int8=args.teacher_int8,
                               cache_latents=args.cache_latents)

        @jax.jit
        def run_n(trainable, opt_state, base_flat, frozen, pixels, ids, key,
                  n):
            def body(i, carry):
                trainable, opt_state, _ = carry
                k = jax.random.fold_in(key, i)
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(trainable, base_flat, frozen,
                                           pixels, ids, k)
                updates, opt_state = tx.update(grads, opt_state, trainable)
                trainable = optax.apply_updates(trainable, updates)
                return trainable, opt_state, metrics["ppft_loss"]
            return jax.lax.fori_loop(
                0, n, body, (trainable, opt_state, jnp.float32(0)))

        n = jnp.int32(args.steps)
        out = run_n(trainable, opt_state, base_flat, frozen, pixels, ids,
                    jax.random.PRNGKey(0), n)
        float(out[2])   # hard sync (compile + warmup)
        t0 = time.perf_counter()
        out = run_n(trainable, opt_state, base_flat, frozen,
                    pixels + 1e-6, ids, jax.random.PRNGKey(1), n)
        last_loss = float(out[2])
        dt = (time.perf_counter() - t0) / args.steps
        print(f"PPFT step (in-loop x{args.steps}): {dt:.3f}s at batch "
              f"{args.batch} ({args.batch/dt/n_data:.2f} samples/sec/chip) "
              f"last_loss={last_loss:.6e}")
        return

    trainable, opt_state, m = step(trainable, opt_state, base_flat, frozen,
                                   pixels, ids, jax.random.PRNGKey(0))
    float(m["ppft_loss"])   # hard sync
    t0 = time.perf_counter()
    for i in range(args.steps):
        trainable, opt_state, m = step(trainable, opt_state, base_flat,
                                       frozen, pixels + i * 1e-6, ids,
                                       jax.random.PRNGKey(i + 1))
        loss = float(m["ppft_loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"PPFT step: {dt:.3f}s at batch {args.batch} "
          f"({args.batch/dt/n_data:.2f} samples/sec/chip) "
          f"last_loss={loss:.6e}")


if __name__ == "__main__":
    main()
