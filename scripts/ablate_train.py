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


def setup(remat: bool, batch: int, res: int, tiny: bool = False):
    cfg = (PipelineConfig.tiny() if tiny
           else PipelineConfig.sd15(lora_rank=320))
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


class _PipeProxy:
    """Pipeline stand-in with one member swapped (op-category ablation)."""

    def __init__(self, inner, **over):
        self._inner, self._over = inner, over

    def __getattr__(self, k):
        if k in self._over:
            return self._over[k]
        return getattr(self._inner, k)


class _UNetNoLora:
    """U-Net proxy forcing scale=None: every LoRA branch is skipped at
    trace time (models/lora.py scale=None semantics)."""

    def __init__(self, unet):
        self._u = unet

    def apply(self, variables, x, t, ctx, scale=None, **kw):
        return self._u.apply(variables, x, t, ctx, None)

    def __getattr__(self, k):
        return getattr(self._u, k)


class _CLIPZero:
    """CLIP proxy returning a zero context (category: text encoder)."""

    def __init__(self, hidden, dtype):
        self._hidden, self._dtype = hidden, dtype

    def apply(self, variables, input_ids, *a, **kw):
        return jnp.zeros(input_ids.shape + (self._hidden,), self._dtype)


class _VAEKeyNoise:
    """VAE proxy sampling latents straight from the rng key (category:
    VAE encoder); keeps shape/dtype identical to vae.sample."""

    def __init__(self, latent_res, channels, dtype):
        self._shape, self._dtype = (latent_res, latent_res, channels), dtype

    def apply(self, variables, pixels, key, method=None, **kw):
        return jax.random.normal(key, (pixels.shape[0],) + self._shape,
                                 self._dtype)


def run_categories(args):
    """Op-category attribution of the PPFT fwd+bwd step (VERDICT r4 #6):
    the PRODUCTION make_loss_fn (train/ppft_train.py:87-205) is timed
    with one category at a time replaced by a near-free stand-in —
    attention (AQUALORA_ATTN_IMPL=identity), LoRA branches+merge, text
    encoder, VAE encoder, Pallas secret-inject, optimizer (grads-only),
    backward (fwd-only).  Each variant is a fresh compile; the category
    share is baseline minus variant.  Mirrors the serving-side
    scripts/ablate_serving_ops.py; results table in docs/PERFORMANCE.md.
    Reference hot loop being attributed: ppft_train.py:987-1068."""
    import aqualora_tpu.ops.secret_inject as sec_inject_mod
    import aqualora_tpu.train.ppft_train as ppft

    B, res = args.batch, args.res
    cfg, pipe, sec, trainable, base_flat, frozen = setup(
        False, B, res, tiny=args.tiny)
    pixels = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (B, res, res, 3)).astype(np.float32))
    ids = jnp.ones((B, 77), jnp.int32)
    key = jax.random.PRNGKey(0)
    tx = optax.adamw(1e-4)

    def full_step(loss_fn):
        @jax.jit
        def step(state, pixels, base_flat, frozen):
            trainable, opt_state = state
            (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, base_flat, frozen, pixels, ids, key)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            # the loss rides along in the carry: a variant whose grads
            # are structurally zero must still PAY for its forward
            # (XLA would otherwise dead-code-eliminate the whole graph).
            # 1e-30*loss is not algebraically foldable, unlike 0.0*loss.
            eps = (1e-30 * loss.astype(jnp.float32))
            return (jax.tree_util.tree_map(
                lambda u: u + eps.astype(u.dtype),
                optax.apply_updates(trainable, updates)), opt_state)
        return step

    def measure(label, loss_fn=None, step=None):
        step = step or full_step(loss_fn or ppft.make_loss_fn(
            pipe_var[0], sec, cfg.watermark.msg_bits))
        state = (trainable, tx.init(trainable))
        return timed(label, step, state, pixels, base_flat, frozen,
                     reps=args.reps)

    results = {}
    pipe_var = [pipe]

    os.environ["AQUALORA_ATTN_IMPL"] = "flash"       # training default
    results["baseline"] = measure("baseline full step")

    os.environ["AQUALORA_ATTN_IMPL"] = "identity"
    results["attn_identity"] = measure("attention -> identity")
    os.environ["AQUALORA_ATTN_IMPL"] = "flash"

    # LoRA category: student scale=None AND the 192-site tree merge
    # skipped.  The LoRA params are PPFT's only trainables, so this
    # variant's backward vanishes with them — its share reads as "LoRA
    # branches + the entire backward that exists only to reach them"
    # (the loss keep-alive in full_step stops XLA from eliminating the
    # forward too).  fwd_nolora below isolates the pure-forward branch
    # cost.
    orig_merge = ppft.merge_lora
    ppft.merge_lora = lambda base, lora: tu.unflatten_dict(dict(base))
    pipe_var[0] = _PipeProxy(pipe, unet=_UNetNoLora(pipe.unet))
    results["lora_off"] = measure("LoRA (branches+their bwd) -> off")
    ppft.merge_lora = orig_merge
    pipe_var[0] = pipe

    pipe_var[0] = _PipeProxy(pipe, clip=_CLIPZero(
        cfg.clip.hidden_size, pipe.dtype))
    results["clip_off"] = measure("text encoder -> zeros")
    pipe_var[0] = pipe

    pipe_var[0] = _PipeProxy(pipe, vae=_VAEKeyNoise(
        res // cfg.vae.downscale, cfg.vae.latent_channels, pipe.dtype))
    results["vae_off"] = measure("VAE encoder -> key noise")
    pipe_var[0] = pipe

    # patch BOTH injection branches of make_loss_fn (ppft_train.py:128):
    # the Pallas kernel fires only when latent == 2*secret_grid; any
    # other resolution takes the sec_encoder.apply fallback, so a
    # kernel-only patch would silently measure a ~0% share there.
    class _SecPassthrough:
        def apply(self, variables, latents, msg, *a, **kw):
            return latents, None

    orig_inject = sec_inject_mod.inject_from_params
    sec_inject_mod.inject_from_params = lambda p, lat, msg, grid: lat
    results["inject_off"] = measure(
        "secret-inject -> passthrough",
        loss_fn=ppft.make_loss_fn(pipe_var[0], _SecPassthrough(),
                                  cfg.watermark.msg_bits))
    sec_inject_mod.inject_from_params = orig_inject

    base_loss = ppft.make_loss_fn(pipe, sec, cfg.watermark.msg_bits)

    @jax.jit
    def grads_only(state, pixels, base_flat, frozen):
        (_, m), grads = jax.value_and_grad(base_loss, has_aux=True)(
            state[0], base_flat, frozen, pixels, ids, key)
        return grads
    results["grads_only"] = timed(
        "grads only (no optimizer)", grads_only,
        (trainable, None), pixels, base_flat, frozen, reps=args.reps)

    @jax.jit
    def fwd_only(state, pixels, base_flat, frozen):
        return base_loss(state[0], base_flat, frozen, pixels, ids, key)[0]
    results["fwd_only"] = timed(
        "fwd only (loss)", fwd_only,
        (trainable, None), pixels, base_flat, frozen, reps=args.reps)

    # pure-forward LoRA branch cost (tree merge + rank matmuls, no bwd)
    ppft.merge_lora = lambda base, lora: tu.unflatten_dict(dict(base))
    nolora_pipe = _PipeProxy(pipe, unet=_UNetNoLora(pipe.unet))
    nolora_loss = ppft.make_loss_fn(nolora_pipe, sec,
                                    cfg.watermark.msg_bits)

    @jax.jit
    def fwd_nolora(state, pixels, base_flat, frozen):
        return nolora_loss(state[0], base_flat, frozen, pixels, ids,
                           key)[0]
    results["fwd_nolora"] = timed(
        "fwd only, LoRA off", fwd_nolora,
        (trainable, None), pixels, base_flat, frozen, reps=args.reps)
    ppft.merge_lora = orig_merge

    base = results["baseline"]
    print("\n== op-category attribution (B%d %dpx, share = baseline - "
          "variant) ==" % (B, res))
    for k, v in results.items():
        if k == "baseline":
            print(f"{k:14s} {v*1e3:7.0f} ms")
        else:
            print(f"{k:14s} {v*1e3:7.0f} ms  share {max(0.0, base-v)*1e3:6.0f}"
                  f" ms ({100*max(0.0, base-v)/base:5.1f}%)")
    import json
    print(json.dumps({"batch": B, "res": res,
                      "ms": {k: v * 1e3 for k, v in results.items()}}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs (CPU smoke of the variant "
                         "plumbing; real numbers need the chip)")
    ap.add_argument("--categories", action="store_true",
                    help="op-category attribution of the production "
                         "PPFT step (VERDICT r4 #6)")
    args = ap.parse_args()
    if args.categories:
        return run_categories(args)
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
