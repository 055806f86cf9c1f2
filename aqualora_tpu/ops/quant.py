"""int8 weight + dynamic activation quantization for the serving path.

v5e's MXU has 2x peak for int8 x int8 -> int32 vs bf16 (394 vs 197
TOPS), and the serving U-Net (`evaluation/utils_eval.py:37-127`
equivalent, `diffusion/pipeline.py`) measures compute-bound at ~58% MXU
in bf16 (docs/PERFORMANCE.md).  This module provides the w8a8 scheme:

  weights   : per-out-channel symmetric int8 (absmax / 127), quantized
              ONCE at load/fold time (`quantize_unet_params_int8`)
  activations: per-row (dense: per token; conv: per image) symmetric
              int8 computed dynamically in-graph — a cheap fused
              reduce+scale that lets the matmul itself run int8 x int8

The model side is dtype-driven, no config flag: `models/lora.py`'s
LoRADense/LoRAConv and `models/layers.py`'s convs branch to
`int8_dense` / `int8_conv` when their "kernel" param arrives as int8
(the converted tree also carries a sibling "kernel_scale" leaf).
Conv-only int8 is the SERVING/BENCH DEFAULT on TPU since the
SD-1.5-scale golden gate measured 1.0000 decoded-bit agreement vs bf16
(GATE_INT8_r03/r04.json; docs/PERFORMANCE.md "int8 promotion
evidence").  Caveat: that gate ran on SYNTHETIC SD-1.5-scale artifacts
(tools/synthetic_artifacts.py) — agreement on the real released
checkpoints remains unverified until they are reachable
(scripts/run_parity.py re-runs the gate the moment they are).
AQUALORA_BENCH_INT8=0 restores pure bf16.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def quantize_kernel_int8(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kernel [..., out] -> (int8 codes [..., out], f32 scale [out]).

    Symmetric per-out-channel: scale = absmax/127 over all non-out axes.
    jnp-based so the whole-tree conversion can run jitted ON DEVICE —
    serving weights live on the TPU and the tunnel's device->host fetch
    (~0.7 MB/s) makes a host-side pass infeasible.
    """
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    absmax = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_axes), 1e-12)
    scale = (absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_activations(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Dynamic symmetric int8 over `axes` (kept as broadcast dims)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                     keepdims=True)
    xs = jnp.maximum(absmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                  ).astype(jnp.int8)
    return xq, xs


def int8_dense(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
               out_dtype=None) -> jnp.ndarray:
    """x [..., in] @ int8 kernel [in, out] with per-token activation quant."""
    xq, xs = _quantize_activations(x, axes=-1)
    acc = jax.lax.dot_general(xq, q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * scale
    return out.astype(out_dtype or x.dtype)


def int8_conv(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
              strides=(1, 1), padding=((1, 1), (1, 1)),
              out_dtype=None) -> jnp.ndarray:
    """NHWC conv with int8 HWIO kernel; per-image activation quant (one
    scale per batch element keeps the conv itself pure int8 x int8)."""
    xq, xs = _quantize_activations(x, axes=(1, 2, 3))
    acc = jax.lax.conv_general_dilated(
        xq, q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * scale
    return out.astype(out_dtype or x.dtype)


def module_int8_apply(mod, x: jnp.ndarray, kernel, features: int, *,
                      dtype, conv_kwargs=None):
    """The shared dtype-driven branch for LoRADense/LoRAConv/layers.Conv2D:
    returns the int8 result when `kernel` arrived quantized (declaring the
    sibling 'kernel_scale' param on `mod`), or None for the float path.
    `conv_kwargs` = {'strides', 'padding'} selects int8_conv over
    int8_dense."""
    if kernel.dtype != jnp.int8:
        return None
    import flax.linen as nn
    kscale = mod.param("kernel_scale", nn.initializers.ones, (features,))
    if conv_kwargs is None:
        return int8_dense(x, kernel, kscale, out_dtype=dtype)
    return int8_conv(x, kernel, kscale, conv_kwargs["strides"],
                     conv_kwargs["padding"], out_dtype=dtype)



@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    """[B,H,T,D] attention with BOTH matmuls in dynamic int8 (serving
    experiment, AQUALORA_ATTN_IMPL=int8).

    Motivation: QK^T contracts over D=40 on SD-1.5 — 40/128 lane padding
    caps it at 31% of the bf16 MXU peak, and int8's 2x peak halves that
    fixed cost; PV contracts over T at full utilization and also gets the
    2x.  Quantization: Q (pre-scaled by `scale`) and K per token over D;
    softmax probs per query row (absmax <= 1); V per channel over T so
    every scale is constant along its contraction dim.

    FORWARD-ONLY, enforced: the rounding ops would silently zero almost
    all gradient, so the custom VJP raises instead — a training run that
    reaches this path (e.g. AQUALORA_ATTN_IMPL=int8 leaking into a
    trainer) fails loudly at trace time rather than learning nothing.
    """
    qf = q.astype(jnp.float32) * scale
    qq, qs = _quantize_activations(qf, axes=-1)          # [B,H,Tq,D]
    kq, ks = _quantize_activations(k.astype(jnp.float32), axes=-1)
    s = jax.lax.dot_general(qq, kq, (((3,), (3,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.int32)
    s = s.astype(jnp.float32) * qs * jnp.swapaxes(ks, -1, -2)
    p = jax.nn.softmax(s, axis=-1)                       # [B,H,Tq,Tk]
    pq, ps = _quantize_activations(p, axes=-1)
    vq, vs = _quantize_activations(v.astype(jnp.float32), axes=-2)
    out = jax.lax.dot_general(pq, vq, (((3,), (2,)), ((0, 1), (0, 1))),
                              preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * ps * vs).astype(q.dtype)


def _int8_attention_fwd(q, k, v, scale):
    return int8_attention(q, k, v, scale), None


def _int8_attention_bwd(scale, residuals, g):
    raise NotImplementedError(
        "int8_attention is a forward-only serving path (dynamic int8 "
        "rounding has ~zero true gradient); use AQUALORA_ATTN_IMPL="
        "flash/sdpa/xla for training")


int8_attention.defvjp(_int8_attention_fwd, _int8_attention_bwd)


# module names whose "kernel" the int8-aware modules can consume:
# LoRADense sites (attention projections + ff), LoRAConv 1x1s, and the
# layers.Conv2D resnet/resample convs.  Deliberately excluded: conv_in /
# conv_out (nn.Conv, edge layers, negligible compute at 4<->320 channels)
# and the TimestepEmbedding/time_emb_proj nn.Dense MLPs (tiny).
_DENSE_SITES = frozenset({"to_q", "to_k", "to_v", "to_out_0", "proj",
                          "net_2"})
_CONV_SITES = frozenset({"conv1", "conv2", "conv_shortcut", "conv",
                         "proj_in", "proj_out"})


def quantize_unet_params_int8(unet_params: Dict,
                              include_convs: bool = True,
                              include_dense: bool = True) -> Dict:
    """Serving-time conversion: each quantizable "kernel" leaf -> int8
    codes plus a sibling "kernel_scale" leaf, targeting exactly the
    int8-aware modules (see _DENSE_SITES/_CONV_SITES).  `lora` subtrees
    are left alone (serving folds the message LoRA into the base kernels
    first — `pipe.fold_message` — so they are dead weight there).

    Measured (docs/PERFORMANCE.md): int8 convs are the winning subset on
    v5e serving; the dense matmuls measured slightly NEGATIVE (dynamic
    activation-quant overhead exceeds the savings at SD projection
    shapes), hence the independent toggles."""
    from flax import traverse_util as tu

    flat = dict(tu.flatten_dict(unet_params))
    for path in list(flat):
        if path[-1] != "kernel" or "lora" in path or len(path) < 2:
            continue
        site = path[-2]
        w = flat[path]
        ok = ((include_dense and w.ndim == 2 and site in _DENSE_SITES)
              or (include_convs and w.ndim == 4
                  and site in _CONV_SITES))
        if ok:
            q, s = quantize_kernel_int8(w)
            flat[path] = q
            flat[path[:-1] + ("kernel_scale",)] = s
    return tu.unflatten_dict(flat)


def quantize_vae_decoder_params_int8(vae_params: Dict) -> Dict:
    """Serving-time int8 for the VAE *decoder* resnet/upsample convs
    (`models/vae.py` Decoder -> layers.ResnetBlock2D/Upsample2D, all
    int8-aware Conv2D).  The encoder is untouched (serving only
    decodes), as are the edge nn.Convs (decoder conv_in/out, the 1x1
    quant convs) and the mid-block attention Denses.  VAE decode is
    ~3.5% of the serving step (docs/PERFORMANCE.md component budget),
    so this is a small additive lever on top of the U-Net convs."""
    from flax import traverse_util as tu

    flat = dict(tu.flatten_dict(vae_params))
    for path in list(flat):
        if (path[0] == "decoder" and path[-1] == "kernel" and len(path) >= 2
                and path[-2] in _CONV_SITES and flat[path].ndim == 4):
            q, s = quantize_kernel_int8(flat[path])
            flat[path] = q
            flat[path[:-1] + ("kernel_scale",)] = s
    return tu.unflatten_dict(flat)

