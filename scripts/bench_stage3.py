"""Stage-3 (rob_enhance_finetune) step throughput on the real chip.

The step is generation-dominated: a 20-step DPM-Solver++ CFG generation
at the chosen resolution bucket (no-grad), then distortion + decoder BCE
backward (`rob_enhance_finetune.py:995-1040`).  One bucket is benched at
a time (each resolution is its own jitted program).
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

from aqualora_tpu.core.config import EfficientNetConfig, PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.models.watermark import SecretDecoder
from aqualora_tpu.train.rob_enhance_finetune import make_decoder_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--res", type=int, default=512,
                    help="resolution bucket (reference draws from "
                         "{512,576,640,704,768})")
    ap.add_argument("--gen_steps", type=int, default=20)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--int8_gen", action="store_true",
                    help="quantize the frozen U-Net conv kernels to int8 "
                         "before the generation loop (the trainer's "
                         "--int8_gen path)")
    args = ap.parse_args()

    cfg = PipelineConfig.sd15(lora_rank=320)
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    # device-put once: fast_init_params returns HOST numpy, and passing it
    # per call re-uploads ~1.7 GB of weights through the tunnel each step
    params = jax.tree_util.tree_map(jnp.asarray,
                                    pipe.fast_init_params(0, args.res,
                                                          args.res))
    if args.int8_gen:
        import functools

        from aqualora_tpu.ops.quant import quantize_unet_params_int8
        params = dict(params)
        params["unet"] = jax.jit(functools.partial(
            quantize_unet_params_int8, include_convs=True,
            include_dense=False))(params["unet"])
    msgdecoder = SecretDecoder(cfg.watermark.msg_bits,
                               EfficientNetConfig.b1(
                                   num_classes=cfg.watermark.msg_bits * 2))
    dec_vars = msgdecoder.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, args.res, args.res, 3)))
    dparams, batch_stats = dec_vars["params"], dec_vars["batch_stats"]
    tx = optax.adamw(5e-6)
    opt_state = tx.init(dparams)
    dec_step = make_decoder_step(msgdecoder, tx)
    gen = pipe.make_generate(num_steps=args.gen_steps, sampler="dpms_m",
                             height=args.res, width=args.res)
    ids = jnp.ones((args.batch, 77), jnp.int32)

    def one(i, dparams, batch_stats, opt_state):
        key = jax.random.PRNGKey(i)
        kmsg, kgen, kstep = jax.random.split(key, 3)
        msg = jax.random.bernoulli(
            kmsg, 0.5, (args.batch, cfg.watermark.msg_bits)).astype(
                jnp.float32)
        diag = pipe.message_scale(dict(params), msg, multiplier=1.03)
        imgs = gen(params, ids, ids, kgen, 7.5, diag)
        imgs01 = (imgs + 1.0) / 2.0
        dparams, batch_stats, opt_state, m = dec_step(
            dparams, batch_stats, opt_state, imgs01, msg, kstep)
        return dparams, batch_stats, opt_state, m

    dparams, batch_stats, opt_state, m = one(0, dparams, batch_stats,
                                             opt_state)
    float(m["loss"])   # compile + warmup sync
    t0 = time.perf_counter()
    for i in range(args.steps):
        dparams, batch_stats, opt_state, m = one(i + 1, dparams,
                                                 batch_stats, opt_state)
        float(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    tag = ", int8-conv gen" if args.int8_gen else ""
    print(f"stage-3 step ({args.res}px, {args.gen_steps}-step gen{tag}): "
          f"{dt:.3f}s at batch {args.batch} "
          f"({args.batch/dt:.2f} samples/sec/chip)")


if __name__ == "__main__":
    main()
