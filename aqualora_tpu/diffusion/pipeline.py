"""End-to-end text->image pipeline, jit-compiled as one XLA program.

TPU-native replacement for the reference's `StableDiffusionPipeline` usage
(`evaluation/utils_eval.py:37-127`, demo `run_gradio_demo.py:10-29`): the
CLIP encode, CFG denoise loop (any of the 12 samplers), and VAE decode all
trace into a single jitted function — no Python in the hot loop, static
shapes, bf16-friendly.

The watermark path threads the MapperNet diagonal through the U-Net's LoRA
sites: `generate(..., lora_scale=mapper(msg) * 1.03)` is the fused
equivalent of create_wm_lora + fuse_lora + generation
(`scripts/create_wm_lora.py:9-51` + `utils_eval.py:80-82`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.samplers import (batch_normal, sample as
                                             run_sampler, split_key)
from aqualora_tpu.diffusion.schedule import NoiseSchedule
from aqualora_tpu.models.clip import CLIPTextModel
from aqualora_tpu.models.unet import UNet2DConditionModel
from aqualora_tpu.models.vae import AutoencoderKL
from aqualora_tpu.models.watermark import MapperNet


@dataclasses.dataclass
class StableDiffusionPipeline:
    """Bundles the three model defs + schedule; params travel separately
    (functional style — the same pipeline object serves any checkpoint)."""

    config: PipelineConfig
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.clip = CLIPTextModel(self.config.clip, dtype=self.dtype)
        self.unet = UNet2DConditionModel(self.config.unet, dtype=self.dtype)
        self.vae = AutoencoderKL(self.config.vae, dtype=self.dtype)
        self.mapper = MapperNet(self.config.watermark.msg_bits,
                                self.config.watermark.lora_rank,
                                self.config.watermark.mapper_std)
        self.schedule = NoiseSchedule.create(self.config.schedule)

    # -- init ----------------------------------------------------------------
    def fast_init_params(self, seed: int = 0, height: int = 512,
                         width: int = 512, with_mapper: bool = True) -> Dict:
        """Host-side numpy param init (no init-trace compile, no device
        round-trip) — benchmarking/serving bring-up on a tunneled TPU where
        a full flax `init` compile costs minutes.  Scale-like leaves get
        ones, everything else small Gaussians; real checkpoints overwrite
        these anyway."""
        import hashlib
        import os
        import pickle

        import numpy as onp
        from flax import traverse_util as _tu

        # disk-cache the shape tree: eval_shape re-traces the whole model
        # init (~50 s for SD-1.5) and the result is config-deterministic
        cache_key = hashlib.md5(
            f"{self.config}|{height}|{width}|{with_mapper}".encode()
        ).hexdigest()
        cache_file = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache",
            f"shapes_{cache_key}.pkl")
        shapes = None
        if os.path.exists(cache_file):
            try:
                with open(cache_file, "rb") as f:
                    flat_sd = pickle.load(f)
                shapes = _tu.unflatten_dict(
                    {k: jax.ShapeDtypeStruct(s, d)
                     for k, (s, d) in flat_sd.items()})
            except Exception:
                shapes = None
        if shapes is None:
            shapes = jax.eval_shape(
                lambda: self.init_params(jax.random.PRNGKey(0), height,
                                         width, with_mapper))
            try:
                os.makedirs(os.path.dirname(cache_file), exist_ok=True)
                with open(cache_file, "wb") as f:
                    pickle.dump({k: (tuple(v.shape), jnp.dtype(v.dtype).name)
                                 for k, v in
                                 _tu.flatten_dict(shapes).items()}, f)
            except Exception:
                pass
        rng = onp.random.default_rng(seed)
        # one shared 64M-element Gaussian pool, sliced per leaf: ~100x
        # faster than per-leaf rng.normal over ~1B params, statistically
        # fine for benchmarking/compile-checking (checkpoints overwrite it)
        pool = rng.standard_normal(1 << 26, dtype=onp.float32)
        flat = {}
        from flax import traverse_util as tu
        for path, leaf in tu.flatten_dict(
                jax.tree_util.tree_map(lambda x: x, shapes)).items():
            name = path[-1]
            shape, dtype = leaf.shape, leaf.dtype
            if name in ("scale",):
                flat[path] = onp.ones(shape, dtype)
            elif name in ("bias",):
                flat[path] = onp.zeros(shape, dtype)
            else:
                fan_in = shape[-2] if len(shape) >= 2 else max(1, shape[-1])
                std = (1.0 / max(1, fan_in)) ** 0.5
                size = int(onp.prod(shape)) if shape else 1
                buf = (pool[:size] if size <= pool.size
                       else onp.resize(pool, size))
                flat[path] = (buf * std).reshape(shape).astype(dtype)
        return tu.unflatten_dict(flat)

    def init_params(self, key: jax.Array, height: int = 512,
                    width: int = 512, with_mapper: bool = True) -> Dict:
        kc, kv, ku, km = jax.random.split(key, 4)
        cfg = self.config
        ids = jnp.zeros((1, cfg.clip.max_position_embeddings), jnp.int32)
        lh, lw = height // cfg.vae.downscale, width // cfg.vae.downscale
        latents = jnp.zeros((1, lh, lw, cfg.unet.in_channels))
        ctx = jnp.zeros((1, cfg.clip.max_position_embeddings,
                         cfg.unet.cross_attention_dim))
        scale = jnp.ones((1, cfg.unet.lora.rank)) if cfg.unet.lora.enabled else None
        te_scale = 1.0 if (cfg.clip.lora and cfg.clip.lora.enabled) else None
        params = {
            "text_encoder": self.clip.init(kc, ids, te_scale)["params"],
            "vae": self.vae.init(kv, jnp.zeros((1, height, width, 3)), kv)["params"],
            "unet": self.unet.init(ku, latents, jnp.zeros((1,)), ctx, scale)["params"],
        }
        if with_mapper:
            params["mapper"] = self.mapper.init(
                km, jnp.zeros((1, cfg.watermark.msg_bits)))["params"]
        return params

    # -- pieces ---------------------------------------------------------------
    def encode_prompt(self, params: Dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        # when the text tower carries LoRA (--train_text_encoder), inference
        # applies it at the standard float scale 1.0, matching diffusers'
        # loaded-LoRA behavior in the reference's final inference
        # (ppft_train.py:1253-1256)
        c = self.config.clip
        te_scale = 1.0 if (c.lora and c.lora.enabled) else None
        return self.clip.apply({"params": params["text_encoder"]}, input_ids,
                               te_scale)

    def decode_latents(self, params: Dict, latents: jnp.ndarray) -> jnp.ndarray:
        z = latents / self.config.vae.scaling_factor
        img = self.vae.apply({"params": params["vae"]}, z, method="decode")
        return jnp.clip(img, -1.0, 1.0)

    def message_scale(self, params: Dict, msg: jnp.ndarray,
                      multiplier: float | None = None) -> jnp.ndarray:
        """msg bits [B, N] -> diag LoRA scale [B, rank] (x inference 1.03)."""
        diag = self.mapper.apply({"params": params["mapper"]}, msg)
        if multiplier is None:
            multiplier = self.config.watermark.inference_scale
        return diag * multiplier

    def fold_message(self, params: Dict, msg: jnp.ndarray,
                     multiplier: float | None = None) -> Dict:
        """Fold one message into the U-Net weights for serving: returns new
        params; generate with lora_scale=None afterwards (~15% faster than
        per-step LoRA, measured).  msg: [bits] or [1, bits]."""
        from aqualora_tpu.models.lora import fold_lora_tree
        diag = self.message_scale(params, msg.reshape(1, -1), multiplier)[0]
        out = dict(params)
        out["unet"] = fold_lora_tree(params["unet"], diag,
                                     alpha_scale=self.config.unet.lora.alpha_scale)
        return out

    # -- the jitted generator --------------------------------------------------
    def make_generate(self, num_steps: int = 25, sampler: str = "dpms_m",
                      height: int = 512, width: int = 512,
                      jit: bool = True):
        """Returns generate(params, prompt_ids, neg_ids, key, guidance_scale,
        lora_scale) -> images [-1, 1] NHWC.  lora_scale: None | [B, rank]."""
        cfg = self.config
        lh, lw = height // cfg.vae.downscale, width // cfg.vae.downscale
        v_pred = cfg.unet.prediction_type == "v_prediction"

        def generate(params, prompt_ids, neg_ids, key,
                     guidance_scale=7.5, lora_scale=None):
            # `key` is one PRNG key or a per-image [B, 2] stack — with a
            # stack the initial latents AND every ancestral/SDE draw are
            # per-image (samplers.split_key/batch_normal), so outputs are
            # invariant to batch chunking (diffusers' per-image generator
            # list semantics, `evaluation/utils_eval.py:118-121`)
            ctx_c = self.encode_prompt(params, prompt_ids)
            ctx_u = self.encode_prompt(params, neg_ids)
            context = jnp.concatenate([ctx_u, ctx_c], axis=0)
            b = prompt_ids.shape[0]
            scale2 = (None if lora_scale is None
                      else jnp.concatenate([lora_scale, lora_scale], axis=0))

            key, sub = split_key(key)
            z = batch_normal(sub, (b, lh, lw, cfg.unet.in_channels),
                             jnp.float32)

            def denoise(x, t):
                x2 = jnp.concatenate([x, x], axis=0).astype(self.dtype)
                tb = jnp.broadcast_to(t, (2 * b,))
                out = self.unet.apply({"params": params["unet"]}, x2, tb,
                                      context, scale2)
                if v_pred:
                    ti = jnp.clip(t.astype(jnp.int32), 0,
                                  cfg.schedule.num_train_timesteps - 1)
                    out = self.schedule.velocity_to_epsilon(
                        out, x2, jnp.broadcast_to(ti, (2 * b,)))
                eps_u, eps_c = jnp.split(out, 2, axis=0)
                return eps_u + guidance_scale * (eps_c - eps_u)

            latents = run_sampler(sampler, self.schedule, denoise, z,
                                  num_steps, key=key)
            return self.decode_latents(params, latents)

        if jit:
            return jax.jit(generate, static_argnames=())
        return generate

    def make_img2img(self, num_steps: int = 10, strength: float = 0.1,
                     height: int = 512, width: int = 512, jit: bool = True):
        """img2img (SDEdit) — encode, add noise at the strength-scaled
        timestep, DDIM-denoise the remaining steps (the regeneration
        attack of `evaluation/utils_eval.py:244-262`).

        Returns img2img(params, images[-1,1], prompt_ids, neg_ids, key,
        guidance_scale) -> images."""
        import numpy as onp
        cfg = self.config
        schedule = self.schedule
        eff = max(1, int(num_steps * strength))
        ts_full = schedule.inference_timesteps(num_steps)
        ts = ts_full[num_steps - eff:]                       # last eff steps
        acp = onp.asarray(schedule.alphas_cumprod)[onp.asarray(ts)]
        alpha, sigma = onp.sqrt(acp), onp.sqrt(1 - acp)
        alpha_n = onp.concatenate([alpha[1:], [1.0]])
        sigma_n = onp.concatenate([sigma[1:], [0.0]])
        c = [jnp.asarray(v, jnp.float32) for v in
             (onp.asarray(ts), alpha, sigma, alpha_n, sigma_n)]
        ts_j, a_j, s_j, an_j, sn_j = c

        def img2img(params, images, prompt_ids, neg_ids, key,
                    guidance_scale=7.5):
            ctx_c = self.encode_prompt(params, prompt_ids)
            ctx_u = self.encode_prompt(params, neg_ids)
            context = jnp.concatenate([ctx_u, ctx_c], axis=0)
            b = images.shape[0]
            # posterior sample drawn via batch_normal so a per-image [B, 2]
            # key stack works here too (draw is bit-identical to the VAE
            # `sample` method for a single key)
            kvae, knoise = split_key(key)
            mean, logvar = self.vae.apply({"params": params["vae"]}, images,
                                          method="encode_moments")
            z0 = self.vae.sample_from_moments(
                mean, logvar, batch_normal(kvae, mean.shape, mean.dtype)
                ) * cfg.vae.scaling_factor
            noise = batch_normal(knoise, z0.shape, jnp.float32)
            x = schedule.add_noise(z0, noise,
                                   jnp.full((b,), ts_j[0], jnp.int32))

            def body(i, x):
                x2 = jnp.concatenate([x, x], axis=0).astype(self.dtype)
                tb = jnp.broadcast_to(ts_j[i], (2 * b,))
                out = self.unet.apply({"params": params["unet"]}, x2, tb,
                                      context, None)
                if cfg.unet.prediction_type == "v_prediction":
                    ti = jnp.clip(ts_j[i].astype(jnp.int32), 0,
                                  cfg.schedule.num_train_timesteps - 1)
                    out = schedule.velocity_to_epsilon(
                        out, x2, jnp.broadcast_to(ti, (2 * b,)))
                eps_u, eps_c = jnp.split(out, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                x0 = (x - s_j[i] * eps) / a_j[i]
                return an_j[i] * x0 + sn_j[i] * eps

            latents = jax.lax.fori_loop(0, eff, body, x)
            return self.decode_latents(params, latents)

        return jax.jit(img2img) if jit else img2img

    # -- regional multi-LoRA inference ----------------------------------------
    def make_regional_generate(self, num_steps: int = 25,
                               sampler: str = "dpms_m", height: int = 512,
                               width: int = 512, jit: bool = True):
        """Regional multi-LoRA inference — the TPU-native counterpart of
        kohya's `LoRAInfModule` regional machinery
        (`scripts/lib/lora.py:120-375`): S LoRA networks, S sub-prompts and
        S spatial masks compose into one image, e.g. a different watermark
        message (or a different style LoRA) per image region.

        Design (idiomatic, not a translation): kohya threads a shared dict
        across monkey-patched modules, expands the batch at every
        `attn2.to_q` and merges per-sub-prompt rows with resized masks at
        each of the 16 `attn2.to_out` sites (`lib/lora.py:276-375`).  Here
        each region instead gets its own *folded* U-Net tree (the same
        fold_message/fold_lora_tree path serving already uses) and its own
        text embedding; the denoiser `jax.vmap`s the U-Net over the stacked
        region weights and merges the CFG'd eps predictions with normalized
        masks:

            eps = sum_s  m̂_s * eps_s,   m̂_s = mask_s / (sum_t mask_t + 1e-4)

        — kohya's mask-weighted-sum combine (`lib/lora.py:330-369`,
        including the +1e-4 denominator) lifted from the to_out sites to
        the eps level (the "latent couple" formulation).  Static shapes, no
        shared mutable state, and the region axis becomes one more batched
        dim for the MXU.

        Returned fn:
            regional(shared_params, unet_stack, masks, prompt_ids, neg_ids,
                     key, guidance_scale=7.5) -> images [-1, 1] NHWC
        where
            shared_params: params dict whose text_encoder/vae are used
                (its "unet" entry is ignored)
            unet_stack: U-Net param tree with a leading region axis S on
                every leaf (stack_region_params)
            masks: [S, H, W] non-negative region weight maps (image res;
                resized to latent res here, matching kohya's per-resolution
                mask_dic)
            prompt_ids: [S, B, 77] per-region sub-prompt token ids
            neg_ids: [B, 77] shared negative prompt.
        """
        cfg = self.config
        lh, lw = height // cfg.vae.downscale, width // cfg.vae.downscale
        v_pred = cfg.unet.prediction_type == "v_prediction"

        def regional(shared_params, unet_stack, masks, prompt_ids, neg_ids,
                     key, guidance_scale=7.5):
            s_regions, b = prompt_ids.shape[:2]
            if masks.shape[0] != s_regions:
                # the resize below is spatial-only by construction; a
                # count mismatch would otherwise silently interpolate
                # across the region axis, blending neighbors' masks.
                raise ValueError(
                    f"masks.shape[0]={masks.shape[0]} does not match the "
                    f"{s_regions} regions implied by prompt_ids")
            ctx_c = jax.vmap(
                lambda ids: self.encode_prompt(shared_params, ids)
            )(prompt_ids)                                   # [S, B, 77, C]
            ctx_u = self.encode_prompt(shared_params, neg_ids)  # [B, 77, C]

            m = jax.image.resize(masks.astype(jnp.float32),
                                 (s_regions, lh, lw), method="bilinear")
            m_hat = m / (jnp.sum(m, axis=0, keepdims=True) + 1e-4)
            m_hat = m_hat[:, None, :, :, None]              # [S, 1, lh, lw, 1]

            key, sub = split_key(key)
            z = batch_normal(sub, (b, lh, lw, cfg.unet.in_channels),
                             jnp.float32)

            def denoise(x, t):
                x2 = jnp.concatenate([x, x], axis=0).astype(self.dtype)
                tb = jnp.broadcast_to(t, (2 * b,))

                def region_eps(unet_params, ctx_cs):
                    context = jnp.concatenate([ctx_u, ctx_cs], axis=0)
                    out = self.unet.apply({"params": unet_params}, x2, tb,
                                          context, None)
                    if v_pred:
                        ti = jnp.clip(t.astype(jnp.int32), 0,
                                      cfg.schedule.num_train_timesteps - 1)
                        out = self.schedule.velocity_to_epsilon(
                            out, x2, jnp.broadcast_to(ti, (2 * b,)))
                    eps_u, eps_c = jnp.split(out, 2, axis=0)
                    return eps_u + guidance_scale * (eps_c - eps_u)

                eps_s = jax.vmap(region_eps)(unet_stack, ctx_c)
                return jnp.sum(eps_s * m_hat, axis=0)

            latents = run_sampler(sampler, self.schedule, denoise, z,
                                  num_steps, key=key)
            return self.decode_latents(shared_params, latents)

        return jax.jit(regional) if jit else regional


def stack_region_params(unet_trees, keep_lora: bool = False) -> Dict:
    """Stack per-region U-Net param trees (e.g. one fold_message output per
    region) along a new leading axis for make_regional_generate.

    The regional denoiser always runs scale=None, so the LoRA down/up
    leaves the fold keeps are dead weight — stripped by default rather
    than stacked S times (~150 MB of rank-320 matrices per region)."""
    from aqualora_tpu.models.lora import strip_lora_params

    if not keep_lora:
        unet_trees = [strip_lora_params(t) for t in unet_trees]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *unet_trees)


def tiny_pipeline(dtype=jnp.float32) -> StableDiffusionPipeline:
    return StableDiffusionPipeline(PipelineConfig.tiny(), dtype=dtype)


def sd15_pipeline(lora_rank: Optional[int] = 320,
                  dtype=jnp.bfloat16) -> StableDiffusionPipeline:
    return StableDiffusionPipeline(PipelineConfig.sd15(lora_rank), dtype=dtype)
