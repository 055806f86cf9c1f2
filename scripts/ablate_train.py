"""Decompose the PPFT training step cost on the real chip.

Variants (each a dependent-chain, scalar-fetch-synced measurement):
  fwd-only loss, fwd+bwd grads, full step (grads + AdamW), remat on/off.
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

import dataclasses as dc

import flax.traverse_util as tu
import numpy as np
import optax

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.models.watermark import SecretEncoder
from aqualora_tpu.train.ppft_train import make_train_step, split_lora, merge_lora


def setup(remat: bool, batch: int, res: int):
    cfg = PipelineConfig.sd15(lora_rank=320)
    if remat:
        cfg = dc.replace(cfg, unet=dc.replace(cfg.unet, remat=True))
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    params = pipe.fast_init_params(0, res, res)
    latent_res = res // cfg.vae.downscale
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
    return cfg, pipe, sec, trainable, base_flat, frozen


def timed(label, fn, state, pixels, *args, reps=3):
    """Scalar-fetch sync + fresh pixels per rep (the tunnel memoizes
    identical (executable, args) executions)."""
    out = fn(state, pixels, *args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    # donating steps consume `state` on the warmup call — continue from the
    # returned state, never from the original buffers
    s = (out if jax.tree_util.tree_structure(out)
         == jax.tree_util.tree_structure(state) else state)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = fn(s, pixels + r * 1e-6, *args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        if jax.tree_util.tree_structure(out) == \
                jax.tree_util.tree_structure(s):
            s = out
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.0f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()
    B, res = args.batch, args.res
    pixels = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (B, res, res, 3)).astype(np.float32))
    ids = jnp.ones((B, 77), jnp.int32)
    key = jax.random.PRNGKey(0)

    for remat in (True, False):
        cfg, pipe, sec, trainable, base_flat, frozen = setup(remat, B, res)
        tx = optax.adamw(1e-4)
        step = make_train_step(pipe, sec, tx, cfg.watermark.msg_bits)
        # reconstruct loss_fn via the same pieces for fwd-only timing
        schedule = pipe.schedule
        scaling = cfg.vae.scaling_factor

        def fwd_only(trainable, pixels, base_flat, frozen):
            # NOTE: the big trees must be *arguments* — closing over them
            # bakes 2 GB of constants into the HLO and the tunnel's
            # remote-compile endpoint rejects the upload (HTTP 413)
            kmsg, kvae, knoise, kt = jax.random.split(key, 4)
            msg = jax.random.bernoulli(kmsg, 0.5, (B, 48)).astype(jnp.float32)
            diag = pipe.mapper.apply({"params": trainable["mapper"]}, msg)
            latents = pipe.vae.apply({"params": frozen["vae"]}, pixels, kvae,
                                     method="sample")
            noise = jax.random.normal(knoise, latents.shape)
            t = jax.random.randint(kt, (B,), 0, 1000)
            noisy = schedule.add_noise(latents * scaling, noise, t)
            ctx = pipe.clip.apply({"params": frozen["text_encoder"]}, ids)
            unet_params = merge_lora(base_flat,
                                     tu.flatten_dict(trainable["lora"]))
            teacher = pipe.unet.apply({"params": unet_params}, noisy, t, ctx,
                                      jnp.zeros_like(diag))
            student = pipe.unet.apply({"params": unet_params}, noisy, t, ctx,
                                      diag)
            return jnp.mean((student - teacher).astype(jnp.float32) ** 2)

        t_fwd = timed(f"remat={remat} fwd-only(2 unet+vae+clip) B{B}",
                      jax.jit(fwd_only), trainable, pixels, base_flat, frozen)
        opt_state = tx.init(trainable)
        t_step = timed(f"remat={remat} full step B{B}",
                       lambda s, px: step(s[0], s[1], base_flat, frozen, px,
                                          ids, key)[:2],
                       (trainable, opt_state), pixels)


if __name__ == "__main__":
    main()
