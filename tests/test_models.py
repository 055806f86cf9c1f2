"""Model forward/shape tests + the LoRA diag-scale semantics gates
(SURVEY.md §4(a): diag-scale LoRA forward vs explicit math, MapperNet
orthogonal init + the +1 offset)."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.core.config import (EfficientNetConfig, LoRAConfig,
                                      PipelineConfig)
from aqualora_tpu.models.clip import CLIPTextModel
from aqualora_tpu.models.lora import LoRADense
from aqualora_tpu.models.unet import UNet2DConditionModel
from aqualora_tpu.models.vae import AutoencoderKL
from aqualora_tpu.models.watermark import MapperNet, SecretDecoder, SecretEncoder

CFG = PipelineConfig.tiny()
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def unet_setup():
    unet = UNet2DConditionModel(CFG.unet)
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    ctx = jax.random.normal(KEY, (2, 77, CFG.unet.cross_attention_dim))
    t = jnp.array([10, 500])
    params = unet.init(KEY, x, t, ctx, jnp.ones((2, CFG.unet.lora.rank)))
    return unet, params, x, t, ctx


def test_unet_shapes(unet_setup):
    unet, params, x, t, ctx = unet_setup
    out = unet.apply(params, x, t, ctx, None)
    assert out.shape == x.shape


def test_lora_site_count(unet_setup):
    """12 LoRA sites per transformer block — 192 on SD-1.5 (unet_keys.json)."""
    _, params, *_ = unet_setup
    flat = tu.flatten_dict(params["params"])
    ups = [k for k in flat if "lora" in k and k[-2] == "up"]
    n_transformers = 4  # tiny config: 1 down + 1 mid + 2 up
    assert len(ups) == 12 * n_transformers


def test_lora_teacher_equals_base(unet_setup):
    """scale=0 tensor (PPFT teacher, ppft_train.py:1026-1029) == no-LoRA."""
    unet, params, x, t, ctx = unet_setup
    rank = CFG.unet.lora.rank
    base = unet.apply(params, x, t, ctx, None)
    zero = unet.apply(params, x, t, ctx, jnp.zeros((2, rank)))
    np.testing.assert_allclose(base, zero, atol=1e-5)


def test_lora_zero_init_inert(unet_setup):
    unet, params, x, t, ctx = unet_setup
    rank = CFG.unet.lora.rank
    base = unet.apply(params, x, t, ctx, None)
    one = unet.apply(params, x, t, ctx, jnp.ones((2, rank)))
    np.testing.assert_allclose(base, one, atol=1e-5)


def test_lora_dense_diag_math():
    """up(down(h) * diag(s)) == explicit matmul (lora_modules.py:15-17)."""
    lora = LoRAConfig(rank=4, enabled=True)
    layer = LoRADense(8, use_bias=False, lora=lora)
    x = jax.random.normal(KEY, (3, 5, 6))
    s = jax.random.normal(jax.random.PRNGKey(1), (3, 4)) + 1.0
    p = layer.init(KEY, x, s)
    flat = tu.flatten_dict(p["params"])
    # make up nonzero so the branch matters
    flat[("lora", "up", "kernel")] = jax.random.normal(KEY, (4, 8)) * 0.1
    p = {"params": tu.unflatten_dict(flat)}
    out = layer.apply(p, x, s)
    W = flat[("kernel",)]
    D = flat[("lora", "down", "kernel")]
    U = flat[("lora", "up", "kernel")]
    expect = x @ W + jnp.einsum("bti,ir,br,ro->bto", x, D, s, U)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_lora_float_scale_standard():
    """float scale s: base + s * up(down(h)) (lora_modules.py:24-25)."""
    lora = LoRAConfig(rank=4, enabled=True)
    layer = LoRADense(8, use_bias=False, lora=lora)
    x = jax.random.normal(KEY, (2, 6))
    p = layer.init(KEY, x, 1.0)
    flat = tu.flatten_dict(p["params"])
    flat[("lora", "up", "kernel")] = jax.random.normal(KEY, (4, 8)) * 0.1
    p = {"params": tu.unflatten_dict(flat)}
    out_half = layer.apply(p, x, 0.5)
    base = x @ flat[("kernel",)]
    delta = (x @ flat[("lora", "down", "kernel")]) @ flat[("lora", "up", "kernel")]
    np.testing.assert_allclose(out_half, base + 0.5 * delta, atol=1e-5)


def test_lora_zero_dim_scale_acts_as_float():
    """A 0-dim traced scalar (a jitted caller passing scale as an
    argument) must multiply the delta like a python float — it used to
    silently behave as scale=1.0 (neither branch fired)."""
    lora = LoRAConfig(rank=4, enabled=True)
    layer = LoRADense(8, use_bias=False, lora=lora)
    x = jax.random.normal(KEY, (2, 6))
    p = layer.init(KEY, x, 1.0)
    flat = tu.flatten_dict(p["params"])
    flat[("lora", "up", "kernel")] = jax.random.normal(KEY, (4, 8)) * 0.1
    p = {"params": tu.unflatten_dict(flat)}
    jit_apply = jax.jit(layer.apply)
    base = x @ flat[("kernel",)]
    np.testing.assert_allclose(jit_apply(p, x, jnp.float32(0.0)), base,
                               atol=1e-6)
    np.testing.assert_allclose(jit_apply(p, x, jnp.float32(0.5)),
                               layer.apply(p, x, 0.5), atol=1e-6)


def test_mapper_properties():
    """Orthogonal rows with unit std; all-zeros message -> scale == 1
    (utils/models.py:106-114)."""
    mapper = MapperNet(input_size=16, output_size=64)
    p = mapper.init(KEY, jnp.zeros((1, 16)))
    emb = p["params"]["bit_embeddings"]
    stds = np.std(np.asarray(emb), axis=1, ddof=1)
    np.testing.assert_allclose(stds, 1.0, atol=1e-5)
    zeros = mapper.apply(p, jnp.zeros((2, 16)))
    np.testing.assert_allclose(zeros, 1.0, atol=1e-6)
    # forward == sum of selected rows / sqrt(N) + 1
    msg = jax.random.bernoulli(KEY, 0.5, (3, 16)).astype(jnp.float32)
    out = mapper.apply(p, msg)
    expect = (msg @ emb) / np.sqrt(16.0) + 1.0
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_secret_encoder_additive_zero_init():
    """Zero-init conv => watermark starts as exact identity (models.py:63)."""
    enc = SecretEncoder(8, base_res=8, resolution=16)
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    msg = jax.random.bernoulli(KEY, 0.5, (2, 8)).astype(jnp.float32)
    p = enc.init(KEY, x, msg)
    wm, c = enc.apply(p, x, msg)
    np.testing.assert_allclose(wm, x, atol=1e-6)
    np.testing.assert_allclose(c, 0.0, atol=1e-6)
    # resizes to arbitrary latent size (models.py:76-79)
    x2 = jax.random.normal(KEY, (2, 24, 20, 4))
    wm2, c2 = enc.apply(p, x2, msg)
    assert wm2.shape == x2.shape


def test_secret_decoder_shapes():
    dec = SecretDecoder(8, EfficientNetConfig.tiny())
    x = jax.random.normal(KEY, (2, 48, 48, 3))
    p = dec.init(KEY, x)
    logits = dec.apply(p, x)
    assert logits.shape == (2, 8, 2)


def test_secret_decoder_train_mode_batchstats():
    dec = SecretDecoder(8, EfficientNetConfig.tiny())
    x = jax.random.normal(KEY, (2, 48, 48, 3))
    variables = dec.init(KEY, x)
    out, mutated = dec.apply(variables, x, True, mutable=["batch_stats"],
                             rngs={"dropout": KEY})
    assert "batch_stats" in mutated


def test_clip_causal():
    """Changing a later token must not affect earlier positions."""
    clip = CLIPTextModel(CFG.clip)
    ids = jnp.ones((1, 77), jnp.int32)
    p = clip.init(KEY, ids)
    out1 = clip.apply(p, ids)
    ids2 = ids.at[0, 50].set(7)
    out2 = clip.apply(p, ids2)
    np.testing.assert_allclose(out1[:, :50], out2[:, :50], atol=1e-5)
    assert np.abs(np.asarray(out1[:, 50:]) - np.asarray(out2[:, 50:])).max() > 1e-4


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(CFG.vae)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    p = vae.init(KEY, x, KEY)
    lat = vae.apply(p, x, method="encode")
    assert lat.shape == (2, 16, 16, CFG.vae.latent_channels)
    rec = vae.apply(p, lat, method="decode")
    assert rec.shape == x.shape
    # stochastic sample differs from mode
    s1 = vae.apply(p, x, jax.random.PRNGKey(1), method="sample")
    s2 = vae.apply(p, x, jax.random.PRNGKey(2), method="sample")
    assert np.abs(np.asarray(s1 - s2)).max() > 1e-6
