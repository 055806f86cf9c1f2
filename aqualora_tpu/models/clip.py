"""CLIP ViT-L/14 text encoder (the SD-1.5 text tower) in Flax.

Replaces the reference's `transformers.CLIPTextModel`
(`train/ppft_train.py:30,527-529`; prompts tokenized to 77 tokens at
`ppft_train.py:848-850`).  Causal-masked pre-LN transformer with quick-GELU
MLPs; returns the last hidden state (what SD conditions on).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aqualora_tpu.core.config import CLIPTextConfig
from aqualora_tpu.ops.attention import dot_product_attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 lora_scale=None) -> jnp.ndarray:
        from aqualora_tpu.core.config import LoRAConfig
        from aqualora_tpu.models.lora import LoRADense
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        lora = c.lora or LoRAConfig(enabled=False)
        dense = lambda name: LoRADense(c.hidden_size, use_bias=True,
                                       lora=lora, dtype=self.dtype, name=name)
        q = dense("q_proj")(x, lora_scale)
        k = dense("k_proj")(x, lora_scale)
        v = dense("v_proj")(x, lora_scale)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v), mask=mask,
                                    scale=head_dim ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        return dense("out_proj")(out, lora_scale)


class CLIPMLP(nn.Module):
    """MLP; carries LoRA on fc1/fc2 when enabled — the reference trains the
    text encoder with `patch_mlp=True` (`train/ppft_train.py:696`)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lora_scale=None) -> jnp.ndarray:
        from aqualora_tpu.core.config import LoRAConfig
        from aqualora_tpu.models.lora import LoRADense
        act = quick_gelu if self.cfg.hidden_act == "quick_gelu" else nn.gelu
        lora = self.cfg.lora or LoRAConfig(enabled=False)
        h = LoRADense(self.cfg.intermediate_size, lora=lora, dtype=self.dtype,
                      name="fc1")(x, lora_scale)
        return LoRADense(self.cfg.hidden_size, lora=lora, dtype=self.dtype,
                         name="fc2")(act(h), lora_scale)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 lora_scale=None) -> jnp.ndarray:
        eps = self.cfg.layer_norm_eps
        h = nn.LayerNorm(epsilon=eps, use_fast_variance=False,
                         dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, self.dtype,
                              name="self_attn")(h, mask, lora_scale)
        h = nn.LayerNorm(epsilon=eps, use_fast_variance=False,
                         dtype=self.dtype, name="layer_norm2")(x)
        return x + CLIPMLP(self.cfg, self.dtype, name="mlp")(h, lora_scale)


class CLIPTextModel(nn.Module):
    """__call__(input_ids [B, 77]) -> last_hidden_state [B, 77, hidden]."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 lora_scale=None) -> jnp.ndarray:
        c = self.cfg
        b, t = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            jnp.arange(t)[None, :])
        x = tok + pos

        causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
        penult = None
        for i in range(c.num_layers):
            if c.penultimate and i == c.num_layers - 1:
                penult = x      # SD2 conditions on the penultimate layer
            x = CLIPEncoderLayer(c, self.dtype,
                                 name=f"layers_{i}")(x, causal, lora_scale)
        out = penult if c.penultimate else x
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            use_fast_variance=False, dtype=self.dtype,
                            name="final_layer_norm")(out)
