"""Settle the last listed serving-attention idea: head-dim padding 40->64.

docs/PERFORMANCE.md "next levers" names fold-time head-dim padding
(40 -> 64 zero columns in to_q/to_k/to_v, zero rows in to_out) as the
one remaining untried attention change — mathematically exact (zero
dims contribute 0 to QK^T and to the output; softmax scale stays
1/sqrt(40)) but it widens the four projection matmuls by 1.6x.  It wins
only if SDPA at d=40 pays an unaligned-lane penalty LARGER than the
extra projection cost: on the MXU both 40 and 64 occupy one 128-lane
tile for the contraction, so the prior is "attention time is flat in d
and padding is a pure projection-FLOPs loss" — this benchmark measures
it instead of guessing.

Shapes: the dominant SD-1.5 512px serving level (64x64 latents, CFG
batch 16): attention [B=16, H=8, T=4096, d], projections
[B*T=65536, 320] x [320, H*d].  Per transformer block the padded layout
adds 3 widened input projections (320 -> H*d) and one widened output
projection (H*d -> 320).

Verdict rule: pad wins iff
    attn(d=40) - attn(d=64)  >  4 * (proj(Hd=512) - proj(Hd=320)).

Measurement notes (tunnel rules, scripts/ablate_tpu.py): one jitted
fori_loop per variant; base tensors passed as jit ARGS (closing over
them would bake ~200 MB of constants into the HLO and the remote
compiler rejects it); inputs varied per iteration by a broadcast
perturbation (identical relative overhead across variants); scalar
fetch to synchronize.

Usage: python scripts/microbench_dpad.py [--iters 30]
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

B, H, T, C = 16, 8, 4096, 320
SCALE = 1.0 / (40.0 ** 0.5)          # semantics of the unpadded model


def make_attn_chain(iters):
    @jax.jit
    def run(q0, k0, v0):
        def body(i, acc):
            eps = (acc * 1e-12 + i).astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
            out = jax.nn.dot_product_attention(
                q0 + eps, k0 + eps, v0, scale=SCALE)   # BTNH layout
            return acc + jnp.sum(out[0, 0, 0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def make_flash_chain(iters):
    from aqualora_tpu.ops.flash_attention import flash_attention

    @jax.jit
    def run(q0, k0, v0):               # BHTD layout
        def body(i, acc):
            eps = (acc * 1e-12 + i).astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
            out = flash_attention(q0 + eps, k0 + eps, v0, scale=SCALE)
            return acc + jnp.sum(out[0, 0, 0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def make_flash_grad_chain(iters):
    """Forward+backward chain for the Pallas kernel (bwd tiling sweeps via
    AQUALORA_FLASH_BQ_BWD / AQUALORA_FLASH_BK_BWD)."""
    from aqualora_tpu.ops.flash_attention import flash_attention

    def loss(q, k, v):
        out = flash_attention(q, k, v, SCALE)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q0, k0, v0):               # BHTD layout
        def body(i, acc):
            eps = (acc * 1e-12 + i).astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
            dq, dk, dv = grad_fn(q0 + eps, k0 + eps, v0)
            return acc + (jnp.sum(dq[0, 0, 0]) + jnp.sum(dk[0, 0, 0])
                          + jnp.sum(dv[0, 0, 0])).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def make_proj_chain(iters):
    @jax.jit
    def run(x0, w):
        def body(i, acc):
            eps = (acc * 1e-12 + i).astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
            y = (x0 + eps) @ w
            return acc + jnp.sum(y[0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def time_run(run, argsets, iters):
    """argsets[0] warms up/compiles; each later set is timed with FRESH
    arrays (identical (executable, args) executions are memoized by the
    tunnel — never time a repeat of the warmup call)."""
    float(run(*argsets[0]))            # compile + warmup
    times = []
    for a in argsets[1:]:
        t0 = time.perf_counter()
        float(run(*a))
        times.append((time.perf_counter() - t0) / iters)
    return min(times), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dims", type=int, nargs="+", default=[64, 40, 128])
    ap.add_argument("--flash", action="store_true",
                    help="also time the Pallas flash kernel at each d")
    ap.add_argument("--grad", action="store_true",
                    help="time the flash fwd+bwd (grad) chain only — bwd "
                         "tiling sweeps via AQUALORA_FLASH_B{Q,K}_BWD")
    ap.add_argument("--T", type=int, default=None,
                    help="override sequence length (SDPA-vs-flash "
                         "crossover sweep at SD-2.1's d=64)")
    ap.add_argument("--heads", type=int, default=None)
    args = ap.parse_args()
    global T, H
    if args.T:
        T = args.T
    if args.heads:
        H = args.heads
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    if args.grad:
        for d in args.dims:
            kq, kk, kv = jax.random.split(key, 3)
            sets = [tuple(jax.random.normal(jax.random.fold_in(kx, r),
                                            (B, H, T, d), jnp.bfloat16)
                          for kx in (kq, kk, kv)) for r in range(4)]
            dt, ts = time_run(make_flash_grad_chain(args.iters), sets,
                              args.iters)
            print(f"Pallas flash GRAD d={d} [{B},{H},{T},{d}] "
                  f"bq_bwd={os.environ.get('AQUALORA_FLASH_BQ_BWD', '-')} "
                  f"bk_bwd={os.environ.get('AQUALORA_FLASH_BK_BWD', '-')}: "
                  f"{dt*1e3:.2f} ms/iter "
                  f"(runs: {', '.join(f'{t*1e3:.2f}' for t in ts)})",
                  flush=True)
        return

    def qkv(d, rep):
        kq, kk, kv = jax.random.split(
            jax.random.fold_in(jax.random.fold_in(key, d), rep), 3)
        q0 = jax.random.normal(kq, (B, T, H, d), jnp.bfloat16)
        k0 = jax.random.normal(kk, (B, T, H, d), jnp.bfloat16)
        v0 = jax.random.normal(kv, (B, T, H, d), jnp.bfloat16)
        if d > 40:                     # zero-padded tail, like fold-time pad
            q0 = q0.at[..., 40:].set(0)
            k0 = k0.at[..., 40:].set(0)
        return q0, k0, v0

    attn = {}
    for d in args.dims:
        dt, ts = time_run(make_attn_chain(args.iters),
                          [qkv(d, r) for r in range(4)], args.iters)
        attn[d] = dt
        print(f"SDPA d={d} [{B},{T},{H},{d}]: {dt*1e3:.2f} ms/iter "
              f"(runs: {', '.join(f'{t*1e3:.2f}' for t in ts)})", flush=True)

    if args.flash:
        for d in args.dims:
            sets = [tuple(t.transpose(0, 2, 1, 3) for t in qkv(d, r))
                    for r in range(4, 8)]           # BHTD for the kernel
            dt, ts = time_run(make_flash_chain(args.iters), sets,
                              args.iters)
            print(f"Pallas flash d={d}: {dt*1e3:.2f} ms/iter "
                  f"(runs: {', '.join(f'{t*1e3:.2f}' for t in ts)})",
                  flush=True)

    proj = {}
    for o in (C, 512):
        def xw(o, rep):
            kx, kw = jax.random.split(jax.random.fold_in(
                jax.random.fold_in(key, 1000 + o), rep))
            return (jax.random.normal(kx, (B * T, C), jnp.bfloat16),
                    jax.random.normal(kw, (C, o), jnp.bfloat16))
        dt, ts = time_run(make_proj_chain(args.iters),
                          [xw(o, r) for r in range(4)], args.iters)
        proj[o] = dt
        print(f"proj [{B*T},{C}]x[{C},{o}]: {dt*1e3:.3f} ms/iter "
              f"(runs: {', '.join(f'{t*1e3:.3f}' for t in ts)})", flush=True)

    if 40 not in attn or 64 not in attn:
        return
    gain = attn[40] - attn[64]
    cost = 4 * (proj[512] - proj[C])
    print(f"\nattention delta (d40 - d64): {gain*1e3:+.3f} ms")
    print(f"projection cost of padding (4x widened): {cost*1e3:+.3f} ms")
    print("verdict:", "PAD WINS" if gain > cost else
          "pad loses — attention is d-flat on the 128-lane MXU tile and "
          "the widened projections are pure cost")


if __name__ == "__main__":
    main()
