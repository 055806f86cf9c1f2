"""Perf ablation on the real chip: dependent-chain timing of each pipeline
component in a single dispatch (the tunneled device neither serializes
independent dispatches nor reports per-op profiles, so each measurement is
a fori_loop chain inside one jitted program).

Usage: python scripts/ablate_tpu.py [--iters 20]
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

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline


_CALL_OVERHEAD = [0.0]


def timed(label, fn, *args, inner_iters):
    """Tunnel-safe timing: (a) identical (executable, args) executions are
    memoized -> inputs must change; (b) block_until_ready does not wait on
    independent dispatches -> each rep's input is the previous rep's
    output (host-level dependency forces serialization).  fn must return
    something with args[1]'s shape/dtype."""
    def sync(o):
        # scalar fetch: the only operation that provably waits for the
        # computation on the tunneled device
        return float(jnp.sum(o.astype(jnp.float32)))

    out = fn(*args)            # compile + warmup
    sync(out)
    reps = 3
    x = args[1]
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(args[0], x, *args[2:])
        sync(out)
        x = out
    dt = (time.perf_counter() - t0 - reps * _CALL_OVERHEAD[0]) / (
        inner_iters * reps)
    print(f"{label}: {dt*1e3:.2f} ms/iter (overhead-corrected)", flush=True)
    return dt


def measure_overhead():
    """Per-call dispatch + scalar-fetch-sync overhead, trivial compute."""
    f = jax.jit(lambda _, x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    out = f(None, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(None, out)
        float(jnp.sum(out))
    _CALL_OVERHEAD[0] = (time.perf_counter() - t0) / 5
    print(f"per-call overhead: {_CALL_OVERHEAD[0]*1e3:.0f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    it = args.iters
    B = args.batch

    measure_overhead()
    cfg = PipelineConfig.sd15(lora_rank=320)
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    params = pipe.fast_init_params(0, 512, 512)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else jnp.asarray(x), params)
    params = jax.device_put(params)

    lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    ts = jnp.zeros((B,), jnp.float32)
    ctx = jnp.zeros((B, 77, 768), jnp.bfloat16)
    diag = jnp.ones((B, 320), jnp.float32)

    def unet_chain(p, x, t, c, s):
        def body(i, x):
            out = pipe.unet.apply({"params": p}, x, t + i, c, s)
            return out.astype(x.dtype)
        return jax.lax.fori_loop(0, it, body, x)

    import aqualora_tpu.ops.flash_attention as F
    orig = F.flash_shapes_ok

    jax.clear_caches()
    t_flash = timed(f"unet fwd B{B} flash", jax.jit(unet_chain), params["unet"],
                    lat, ts, ctx, diag, inner_iters=it)

    F.flash_shapes_ok = lambda *a: False
    jax.clear_caches()
    t_xla = timed(f"unet fwd B{B} xla-attn", jax.jit(unet_chain),
                  params["unet"], lat, ts, ctx, diag, inner_iters=it)
    F.flash_shapes_ok = orig

    # no-lora variant (is the rank-320 LoRA material?)
    jax.clear_caches()
    def unet_nolora(p, x, t, c):
        def body(i, x):
            return pipe.unet.apply({"params": p}, x, t + i, c,
                                   None).astype(x.dtype)
        return jax.lax.fori_loop(0, it, body, x)
    t_nolora = timed(f"unet fwd B{B} no-lora", jax.jit(unet_nolora),
                     params["unet"], lat, ts, ctx, inner_iters=it)

    # VAE decode chain (B8 like the bench batch)
    z = jnp.zeros((8, 64, 64, 4), jnp.bfloat16)
    def vae_chain(p, z):
        def body(i, z):
            img = pipe.vae.apply({"params": p}, z, method="decode")
            return z + jnp.mean(img).astype(z.dtype) * 1e-9
        return jax.lax.fori_loop(0, max(1, it // 4), body, z)
    t_vae = timed("vae decode B8", jax.jit(vae_chain), params["vae"], z,
                  inner_iters=max(1, it // 4))

    ids = jnp.zeros((16, 77), jnp.int32)
    def clip_chain(p, i0):
        def body(i, i0):
            e = pipe.clip.apply({"params": p}, i0)
            return i0 + (jnp.mean(e) * 0).astype(i0.dtype)
        return jax.lax.fori_loop(0, max(1, it // 4), body, i0)
    t_clip = timed("clip encode B16", jax.jit(clip_chain),
                   params["text_encoder"], ids,
                   inner_iters=max(1, it // 4))

    # bench protocol: batch 8 images, CFG doubles the U-Net batch to 16
    # (== B here); 25 sampler iterations; one VAE decode + CLIP encode.
    per_img = (25 * t_flash + t_vae + t_clip) / 8
    print(f"\nprojected DDIM-25 s/img: {per_img:.3f} "
          f"({1/per_img:.2f} img/s); unet share "
          f"{25*t_flash/ (per_img*8) *100:.0f}%", flush=True)
    print(f"flash vs xla attention: {t_flash*1e3:.1f} vs {t_xla*1e3:.1f} ms; "
          f"lora overhead {100*(t_flash-t_nolora)/t_nolora:.1f}%", flush=True)


if __name__ == "__main__":
    main()
