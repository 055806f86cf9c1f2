"""Settle the "Pallas int8 flash attention" question with raw-matmul data.

docs/PERFORMANCE.md lists an int8 flash kernel as the one remaining
2x-class serving idea (attention = 36% of the U-Net forward, pinned by
the d=40 QK^T lane padding).  Before building a kernel, measure the
primitive it would be made of: batched QK^T contracting over d=40 at the
SD-1.5 512px serving shape, bf16 vs int8.

Hypothesis to test: the 40->128 lane padding wastes the same 3.2x in
both dtypes, and the MXU's 2x int8 peak applies on top, so int8 QK^T
should run ~2x faster.  Decision rule (from the measured serving A/B):
the bf16 flash forward is 1.8x slower than fused SDPA at these shapes,
so an int8 flash kernel is only worth building if the int8 QK^T speedup
is comfortably ABOVE 1.8x — otherwise the kernel at best reaches SDPA
parity and the idea is dead.

Measurement notes (tunnel rules, scripts/ablate_tpu.py): one jitted
fori_loop per variant, fresh random inputs each iteration, scalar fetch.
The [T,T] score tensor is reduced (max) in-graph; both variants' scores
are 4 B/elem (f32 vs int32) so even if XLA materializes them the
comparison isolates the matmul dtype.  Sanity: an UNfused 8.6 GB score
write would bound the iter at ~11 ms (819 GB/s HBM) = 16 TOP/s; numbers
well above that prove the reduce fused into the GEMM.

Usage: python scripts/microbench_int8_attn.py [--iters 30]
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

# SD-1.5 512px serving, CFG batch 16, the dominant 64x64 self-attn level:
# [B*H, T, D] with B*H = 16*8, T = 4096, D = 40.
BH, T, D = 128, 4096, 40
FLOPS = 2 * BH * T * T * D


def qk_bf16(k1, k2, acc):
    q = jax.random.normal(k1, (BH, T, D), jnp.bfloat16) + acc.astype(jnp.bfloat16)
    kk = jax.random.normal(k2, (BH, T, D), jnp.bfloat16)
    s = jax.lax.dot_general(q, kk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.max(s)


def qk_int8(k1, k2, acc):
    q = jax.random.randint(k1, (BH, T, D), -126, 126, jnp.int8)
    kk = jax.random.randint(k2, (BH, T, D), -127, 127, jnp.int8)
    q = q + (jnp.round(acc) % 2).astype(jnp.int8)
    s = jax.lax.dot_general(q, kk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)
    return jnp.max(s).astype(jnp.float32)


def chain(fn, iters):
    @jax.jit
    def run(key):
        def body(i, carry):
            acc, k = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(k, i), 3)
            out = fn(k1, k2, acc)
            return acc + out.astype(jnp.float32) * 1e-9, k3

        acc, _ = jax.lax.fori_loop(0, iters, body,
                                   (jnp.float32(0.0), key))
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    results = {}
    for label, fn in (("QK^T bf16", qk_bf16), ("QK^T int8", qk_int8)):
        run = chain(fn, args.iters)
        float(run(jax.random.PRNGKey(0)))  # compile + warmup
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(1)))
        dt = (time.perf_counter() - t0) / args.iters
        results[label] = dt
        print(f"{label} (contract d=40, [{BH},{T},{D}]): {dt*1e3:.2f} "
              f"ms/iter = {FLOPS/dt/1e12:.1f} TOP/s", flush=True)

    speedup = results["QK^T bf16"] / results["QK^T int8"]
    print(f"\nint8 QK^T speedup: {speedup:.2f}x "
          f"(kernel-worthiness bar: >1.8x; see module docstring)")


if __name__ == "__main__":
    main()
