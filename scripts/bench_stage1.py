"""Stage-1 (latent_wm_pretrain) step throughput on the real chip.

The heaviest training step in the system per sample: VAE encode + 2x VAE
decode + LPIPS-VGG + distortion + EfficientNet-B1, with backward through
secret encoder + decoder (the reference runs this single-GPU at batch 5,
`latent_wm_pretrain.py:254-267`).
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

import numpy as np
import optax

from aqualora_tpu.core.config import EfficientNetConfig, VAEConfig, WatermarkConfig
from aqualora_tpu.train.latent_wm_pretrain import build_models, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)   # reference default
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--attn", type=str, default="flash")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--remat_vae_decode", action="store_true")
    ap.add_argument("--remat_lpips", action="store_true")
    ap.add_argument("--adam8bit", action="store_true",
                    help="int8 blockwise optimizer moments "
                         "(train/adamw8bit.py) — frees HBM for batch")
    args = ap.parse_args()
    os.environ["AQUALORA_ATTN_IMPL"] = args.attn
    B, res = args.batch, args.res

    vae_cfg, wm_cfg = VAEConfig.sd15(), WatermarkConfig()
    models = build_models(vae_cfg, wm_cfg, EfficientNetConfig.b1(),
                          dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, res, res, 3))
    lat = jnp.zeros((1, res // 8, res // 8, 4))
    msg = jnp.zeros((1, wm_cfg.msg_bits))
    frozen = {"vae": models.vae.init(key, img, key)["params"],
              "lpips": models.lpips.init(key, img, img)["params"]}
    dec_vars = models.sec_decoder.init(key, img)
    params = {"sec_encoder": models.sec_encoder.init(key, lat, msg)["params"],
              "sec_decoder": dec_vars["params"]}
    batch_stats = dec_vars.get("batch_stats", {})

    if args.adam8bit:
        from aqualora_tpu.train.adamw8bit import adamw8bit
        tx = adamw8bit(1e-3, weight_decay=1e-4)
    else:
        tx = optax.adamw(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)
    step = make_train_step(models, tx, wm_cfg.msg_bits,
                           remat_vae_decode=args.remat_vae_decode,
                           remat_lpips=args.remat_lpips)
    ctl = {"wm_scale": jnp.float32(1.0),
           "loss_weights": jnp.asarray((5.0, 1.0, 1.5)),
           "distort_probs": jnp.asarray((0.4, 0.1, 0.2, 0.05, 0.1, 0.15)),
           "fixinit": jnp.asarray(False), "random_aug": jnp.asarray(True)}
    pixels = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (B, res, res, 3)).astype(np.float32))

    state = (params, batch_stats, opt_state)
    out = step(*state, frozen, pixels, jax.random.PRNGKey(1), ctl)
    float(out[3]["loss"])
    state = out[:3]
    t0 = time.perf_counter()
    for i in range(args.steps):
        out = step(*state, frozen, pixels + i * 1e-6,
                   jax.random.PRNGKey(i + 2), ctl)
        float(out[3]["loss"])
        state = out[:3]
    dt = (time.perf_counter() - t0) / args.steps
    print(f"stage-1 step: {dt:.3f}s at batch {B} "
          f"({B/dt:.2f} samples/sec/chip)")


if __name__ == "__main__":
    main()
