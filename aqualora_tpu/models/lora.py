"""First-class functional LoRA with a per-message diagonal scaling matrix.

The core AquaLoRA trick: diffusers' LoRA forwards are monkey-patched in the
reference so that a *tensor* `scale` is applied as a diagonal matrix between
the down and up projections (`utils/lora_modules.py:9-44`):

    linear:  up(down(h) @ diag_embed(scale))
    conv:    up(down(h) * scale[:, :, None, None])          (NCHW there)

A *float* scale instead multiplies the whole LoRA contribution (standard
LoRA inference scaling, used by `create_wm_lora` with 1.03).

Here there is no monkey-patching: `LoRADense` / `LoRAConv` own their base
kernel (so the param path matches the diffusers key, e.g.
`attn1.to_q.kernel`) plus a `lora/{down,up}` child, and the scale is a
traced argument threaded functionally through the whole U-Net — the
teacher pass (`ppft_train.py:1026-1029`, scale=0) and student pass
(`:1032-1035`, scale=mapper(msg)) are the same jitted function.

`DiagScale` values accepted everywhere:
  None          -> LoRA contribution skipped entirely (pure base forward)
  python float  -> standard LoRA: base + s * up(down(h))
  [rank] / [B, rank] array -> diagonal modulation between down and up
"""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import LoRAConfig

DiagScale = Union[None, float, jnp.ndarray]


def _apply_diag(down_h: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Multiply the rank (last) dim by a per-sample diagonal [B, rank]/[rank]."""
    if scale.ndim == 1:
        return down_h * scale
    # [B, rank] -> [B, 1, ..., 1, rank]
    shape = (scale.shape[0],) + (1,) * (down_h.ndim - 2) + (scale.shape[-1],)
    return down_h * scale.reshape(shape)


def _elementwise_dropout(mod: nn.Module, h: jnp.ndarray,
                         p: float) -> jnp.ndarray:
    """kohya's plain `dropout` on the down activations (lib/lora.py:96-97,
    F.dropout semantics: Bernoulli(1-p) mask, 1/(1-p) rescale).  Inert
    unless a 'lora_dropout' rng is provided (training only)."""
    if p <= 0.0 or not mod.has_rng("lora_dropout"):
        return h
    mask = jax.random.bernoulli(mod.make_rng("lora_dropout"), 1.0 - p,
                                h.shape)
    return h * mask.astype(h.dtype) / (1.0 - p)


def _module_keep(mod: nn.Module, p: float):
    """kohya `module_dropout` (lib/lora.py:89-91): one Bernoulli draw per
    module per step; on drop the whole LoRA delta vanishes (NO rescale —
    the reference returns org_forwarded unchanged).  make_rng folds the
    module path, so every one of the 192 sites draws independently."""
    if p <= 0.0 or not mod.has_rng("lora_dropout"):
        return None
    return jax.random.bernoulli(mod.make_rng("lora_dropout"), 1.0 - p)


class _LoRACore(nn.Module):
    """down/up pair. Dense for rank-reduction of the last axis."""

    rank: int
    features: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale) -> jnp.ndarray:
        down = nn.Dense(self.rank, use_bias=False, name="down",
                        kernel_init=nn.initializers.normal(1.0 / self.rank),
                        dtype=self.dtype)
        up = nn.Dense(self.features, use_bias=False, name="up",
                      kernel_init=nn.initializers.zeros, dtype=self.dtype)
        h = _elementwise_dropout(self, down(x), self.dropout)
        is_diag = isinstance(scale, jnp.ndarray) and scale.ndim >= 1
        if is_diag:
            h = _apply_diag(h, scale)
        h = up(h)
        if not is_diag:
            # python float OR a 0-dim traced scalar (a jitted caller
            # passing scale as an argument) — both multiply the delta
            h = h * scale
        return h


class LoRADense(nn.Module):
    """Dense layer with an optional LoRA branch (diag-scale aware)."""

    features: int
    use_bias: bool = True
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale = None) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        # serving int8 path (ops/quant.py): engages when the converted
        # param tree carries int8 codes + a per-out-channel scale
        from aqualora_tpu.ops.quant import module_int8_apply
        y = module_int8_apply(self, x, kernel, self.features,
                              dtype=self.dtype)
        if y is None:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.lora.enabled and scale is not None:
            delta = _LoRACore(self.lora.rank, self.features, self.dtype,
                              dropout=self.lora.dropout, name="lora")(x, scale)
            keep = _module_keep(self, self.lora.module_dropout)
            if keep is not None:
                delta = jnp.where(keep, delta, jnp.zeros_like(delta))
            y = y + self.lora.alpha_scale * delta
        return y


class _LoRAConvCore(nn.Module):
    """down/up conv pair (down mirrors the base conv geometry, up is 1x1)."""

    rank: int
    features: int
    kernel_size: tuple = (1, 1)
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale) -> jnp.ndarray:
        down = nn.Conv(self.rank, self.kernel_size, strides=self.strides,
                       padding=self.padding, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(1.0 / self.rank),
                       name="down")
        up = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="up")
        h = _elementwise_dropout(self, down(x), self.dropout)
        is_diag = isinstance(scale, jnp.ndarray) and scale.ndim >= 1
        if is_diag:
            h = _apply_diag(h, scale)
        h = up(h)
        if not is_diag:
            # float or 0-dim traced scalar, as in _LoRACore
            h = h * scale
        return h


class LoRAConv(nn.Module):
    """Conv layer (NHWC) with an optional LoRA branch.

    Owns its kernel/bias directly (so the param path matches the diffusers
    key, e.g. `proj_in.kernel`).  Used for the transformer blocks'
    proj_in / proj_out 1x1 convs — the reference's `LoRAConv2dLayer`
    targets (`ppft_train.py:636-650`).
    """

    features: int
    kernel_size: tuple = (1, 1)
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    use_bias: bool = True
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale = None) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        from aqualora_tpu.ops.quant import module_int8_apply
        y = module_int8_apply(self, x, kernel, self.features,
                              dtype=self.dtype,
                              conv_kwargs={"strides": self.strides,
                                           "padding": self.padding})
        if y is None:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.lora.enabled and scale is not None:
            delta = _LoRAConvCore(self.lora.rank, self.features,
                                  self.kernel_size, self.strides, self.padding,
                                  self.dtype, dropout=self.lora.dropout,
                                  name="lora")(x, scale)
            keep = _module_keep(self, self.lora.module_dropout)
            if keep is not None:
                delta = jnp.where(keep, delta, jnp.zeros_like(delta))
            y = y + self.lora.alpha_scale * delta
        return y


def fold_lora_tree(unet_params: dict, diag: jnp.ndarray,
                   multiplier: float = 1.0, alpha_scale: float = 1.0) -> dict:
    """Fold a single-message diagonal into the base kernels on device.

    The device twin of `scripts/create_wm_lora.py:26-37`: for serving, the
    message is fixed, so `W' = W + alpha * down @ diag(s) @ up` once and the
    denoise loop runs the plain U-Net (scale=None) — measured ~15% faster
    than paying the LoRA matmuls every step (scripts/ablate_tpu.py).

    diag: [rank] (one message).  Returns a new param tree; LoRA params are
    kept (zeroed-out contribution is skipped by scale=None)."""
    from flax import traverse_util as tu

    flat = dict(tu.flatten_dict(unet_params))
    scale = diag * multiplier * alpha_scale
    for path in list(flat):
        if path[-3:] == ("lora", "down", "kernel"):
            base = path[:-3]
            down = flat[path]
            up = flat[base + ("lora", "up", "kernel")]
            kernel = flat[base + ("kernel",)]
            if down.ndim == 2:        # dense: [in, r] @ diag @ [r, out]
                delta = (down * scale) @ up
            else:                     # conv: [kh,kw,in,r] x diag, 1x1 up
                delta = jnp.einsum("hwir,zyro->hwio", down * scale, up)
            flat[base + ("kernel",)] = (kernel + delta).astype(kernel.dtype)
    return tu.unflatten_dict(flat)


def strip_lora_params(unet_params: dict) -> dict:
    """Drop the LoRA down/up subtrees from a (folded) U-Net param tree.

    At `scale=None` the LoRA submodules are never called, so flax never
    requests their params — but they still occupy HBM when the tree is
    replicated or stacked (regional inference stacks S copies of ~150 MB
    of rank-320 matrices that `region_eps` never reads)."""
    from flax import traverse_util as tu

    flat = {p: v for p, v in tu.flatten_dict(unet_params).items()
            if "lora" not in p}
    return tu.unflatten_dict(flat)


def as_diag_scale(scale: DiagScale, batch: int, rank: int) -> DiagScale:
    """Normalize a user-supplied scale into a jit-stable representation."""
    if scale is None or isinstance(scale, (int, float)):
        return scale
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return jnp.broadcast_to(scale[None], (rank,))
    return scale
