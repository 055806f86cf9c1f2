"""Benchmark: watermarked-image generation throughput on one TPU chip.

Protocol (BASELINE.json metric): 512x512, DDIM-25, CFG 7.5, watermark LoRA
rank 320 active with a mapper-derived diagonal message scale — i.e. the
demo/eval serving path (`evaluation/utils_eval.py:37-127` fused into one
jitted program).  Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison constant is the commonly-measured A100 fp16 DDIM-25 SD-1.5
throughput of ~1.33 imgs/s (diffusers ~0.75 s/img).  The north-star asks
for >= 2x that, so vs_baseline = value / 1.33 (>= 2.0 means target met).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_IMGS_PER_SEC = 1.33
BATCH = 8
STEPS = 25
RES = 512


def main():
    import os

    import numpy as np

    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.core.tokenizer import FallbackTokenizer
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline

    # persistent compile cache: repeat runs (and the driver's run) skip the
    # multi-minute first compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = PipelineConfig.sd15(lora_rank=320)
        res, batch, steps = RES, BATCH, STEPS
        dtype = jnp.bfloat16
    else:  # CPU fallback so the script is runnable anywhere
        cfg = PipelineConfig.tiny()
        res, batch, steps = 64, 2, 4
        dtype = jnp.float32

    pipe = StableDiffusionPipeline(cfg, dtype=dtype)
    key = jax.random.PRNGKey(0)
    # host-side init (flax init on a tunneled TPU costs minutes); store the
    # serving weights in bf16 — halves HBM weight traffic per U-Net call
    params = pipe.fast_init_params(0, height=res, width=res)
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), params)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if x.dtype == np.float16 else jnp.asarray(x), params)
    params = jax.device_put(params)

    tok = FallbackTokenizer(cfg.clip.vocab_size)
    ids = jnp.asarray(tok(["a photograph of an astronaut riding a horse"]
                          * batch))
    neg = jnp.asarray(tok([""] * batch))
    # serving path: one watermark message per deployment -> fold the LoRA
    # into the weights once (create_wm_lora semantics, on device) and run
    # the plain U-Net in the denoise loop (~15% faster, scripts/ablate_tpu)
    msg = jax.random.bernoulli(key, 0.5,
                               (cfg.watermark.msg_bits,)).astype(jnp.float32)
    params = jax.jit(pipe.fold_message)(params, msg)
    diag = None

    gen = pipe.make_generate(num_steps=steps, sampler="ddim",
                             height=res, width=res)

    # compile + warmup
    imgs = gen(params, ids, neg, key, 7.5, diag)
    jax.block_until_ready(imgs)
    float(jnp.sum(imgs))   # scalar fetch = hard sync

    # sync via a scalar fetch per iteration: on the tunneled device,
    # block_until_ready neither serializes independent dispatches nor
    # guarantees completion; fetching a reduction of the output does.
    n_iters = 3 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(n_iters):
        imgs = gen(params, ids, neg, jax.random.PRNGKey(i + 1), 7.5, diag)
        float(jnp.sum(imgs))
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_iters / dt
    result = {
        "metric": f"{res}x{res} watermarked images/sec/chip (DDIM-{steps}, "
                  f"CFG, rank-320 msg LoRA)" if on_tpu else
                  f"tiny-config images/sec (CPU fallback, {res}px DDIM-{steps})",
        "value": round(imgs_per_sec, 4),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
