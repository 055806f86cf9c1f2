"""Op-category attribution for the serving U-Net forward (task: find the
top non-matmul cost, then decide whether a Pallas fusion is worth it).

The tunneled axon device exposes no per-op profiles (see ablate_tpu.py),
so attribution is by MEASURED ABLATION: each variant monkeypatches one op
category to identity, re-traces the U-Net, and times a dependent fori_loop
chain of forwards in one dispatch.  full - variant ~= cost of that
category as scheduled (including what XLA would have fused around it —
a negative or ~0 delta means the category rides free inside fusions).

Usage: python scripts/ablate_serving_ops.py [--iters 20] [--batch 16]
"""

import argparse
import contextlib
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

import flax.linen as nn
import numpy as np

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline


def sync(o):
    return float(jnp.sum(o.astype(jnp.float32)))


@contextlib.contextmanager
def patched(target_obj, attr, value):
    orig = getattr(target_obj, attr)
    setattr(target_obj, attr, value)
    try:
        yield
    finally:
        setattr(target_obj, attr, orig)


def variant_ctx(name):
    """Monkeypatch one op category to identity for the trace."""
    import aqualora_tpu.models.layers as L
    if name == "full":
        return contextlib.nullcontext()
    if name == "groupnorm_off":
        return patched(nn.GroupNorm, "__call__", lambda self, x: x)
    if name == "layernorm_off":
        return patched(nn.LayerNorm, "__call__", lambda self, x: x)
    if name == "silu_off":       # resnet GN-SiLU-conv + time embedding
        return patched(nn, "silu", lambda x: x)
    if name == "gelu_off":       # ff GEGLU gate
        return patched(nn, "gelu", lambda x, approximate=True: x)
    if name == "attention_off":  # softmax(QK^T)V -> broadcast-V stub
        return patched(L, "dot_product_attention",
                       lambda q, k, v, **kw: jnp.broadcast_to(
                           v[..., :1, :], q.shape).astype(q.dtype))
    if name == "upsample_off":   # nearest x2 resize before up convs
        orig = jax.image.resize

        def no_up(x, shape, method, **kw):
            if method == "nearest" and x.shape[1] * 2 == shape[1]:
                return jnp.broadcast_to(x[:, :, None, :, None, :],
                                        (x.shape[0], x.shape[1], 2,
                                         x.shape[2], 2, x.shape[3])
                                        ).reshape(shape)
            return orig(x, shape, method, **kw)
        return patched(jax.image, "resize", no_up)
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16,
                    help="CFG-doubled U-Net batch (serving B8 -> 16)")
    ap.add_argument("--variants", type=str, default=(
        "full,groupnorm_off,layernorm_off,silu_off,gelu_off,"
        "attention_off,upsample_off,full"))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (plumbing sanity only)")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = PipelineConfig.tiny()
        args.batch, args.iters = 2, 2
    else:
        cfg = PipelineConfig.sd15(lora_rank=320)
    B, it = args.batch, args.iters
    lat = 64 if not args.tiny else 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, lat, lat, 4)), jnp.bfloat16)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, 77, cfg.unet.cross_attention_dim)), jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)

    # params built ONCE, unpatched (the full tree is a superset — flax
    # ignores entries the patched-out modules never request), so the
    # fast_init_params disk shape cache stays consistent
    pipe = StableDiffusionPipeline(cfg, dtype=jnp.bfloat16)
    res = lat * cfg.vae.downscale
    params = pipe.fast_init_params(0, res, res)["unet"]
    params = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float16).astype(np.float32)
        if np.asarray(a).dtype == np.float64 else np.asarray(a), params))

    results = {}
    first = True
    for name in args.variants.split(","):
        with variant_ctx(name):
            @jax.jit
            def chain(params, x0):
                def body(i, h):
                    out = pipe.unet.apply({"params": params}, h, t, ctx,
                                          None)
                    return (out * 0.05 + h * 0.95).astype(h.dtype)
                return jax.lax.fori_loop(0, it, body, x0)

            out = chain(params, x)          # compile + warmup
            sync(out)
            if first:
                # measured: the very first timed chain of a session runs
                # ~20% slow (chip warmup) — burn an extra rep
                sync(chain(params, x * 0.999))
                first = False
            t0 = time.perf_counter()
            # distinct input per variant: the tunnel memoizes identical
            # (executable, args) executions (CLAUDE.md) — a repeated
            # 'full' timed with the same buffer could measure ~0
            out = chain(params, x * (1.0 + 0.001 * (len(results) + 1)))
            sync(out)
            dt = (time.perf_counter() - t0) / it
        results[f"{name}#{len(results)}"] = dt
        print(f"{name}: {dt*1e3:.2f} ms/forward (B{B})", flush=True)

    full = np.mean([v for k, v in results.items() if k.startswith("full")])
    print("\nattribution (full - variant; ~0/negative => fused for free):")
    for k, v in results.items():
        if not k.startswith("full"):
            print(f"  {k.split('#')[0]:16s} {1e3*(full - v):+7.2f} ms "
                  f"({100 * (full - v) / full:+.1f}%)")


if __name__ == "__main__":
    main()
