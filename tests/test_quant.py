"""int8 serving quantization (ops/quant.py): math accuracy, conversion
targeting, and the dtype-driven module branch end-to-end through the
U-Net (the serving path the AQUALORA_BENCH_INT8 bench flag exercises)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util as tu

from aqualora_tpu.ops.quant import (int8_conv, int8_dense,
                                    quantize_kernel_int8,
                                    quantize_unet_params_int8)


def test_kernel_quant_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (37, 16)) * 0.2
    q, s = quantize_kernel_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    back = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric linear code: error <= scale/2 per element
    assert np.abs(back - np.asarray(w)).max() <= float(s.max()) / 2 + 1e-7


def test_int8_dense_tracks_f32_matmul():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (6, 128))
    w = jax.random.normal(kw, (128, 64)) * 0.05
    q, s = quantize_kernel_int8(w)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_dense(x, q, s))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_conv_tracks_f32_conv():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (2, 16, 16, 32))
    w = jax.random.normal(kw, (3, 3, 32, 24)) * 0.05
    q, s = quantize_kernel_int8(w)
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    out = np.asarray(int8_conv(x, q, s))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_int8_attention_tracks_f32():
    from aqualora_tpu.ops.quant import int8_attention
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, 4, 64, 40))
    k = jax.random.normal(kk, (2, 4, 77, 40))
    v = jax.random.normal(kv, (2, 4, 77, 40))
    scale = 40 ** -0.5
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * scale
    ref = np.asarray(jnp.einsum("bhts,bhsd->bhtd",
                                jax.nn.softmax(s, axis=-1), v))
    out = np.asarray(int8_attention(q, k, v, scale))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
    # dispatcher routes AQUALORA_ATTN_IMPL=int8 (mask-free path)
    from aqualora_tpu.ops.attention import _dispatch_impl
    out2 = np.asarray(_dispatch_impl(q, k, v, None, scale, True, "int8"))
    np.testing.assert_allclose(out2, out, atol=1e-6)
    # forward-only is ENFORCED: differentiating raises instead of
    # silently producing ~zero gradients
    import pytest
    with pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(lambda q: jnp.sum(int8_attention(q, k, v, scale)))(q)


def _tiny_unet_params():
    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.models.unet import UNet2DConditionModel
    cfg = PipelineConfig.tiny().unet
    unet = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 4)) * 0.5
    ctx = jax.random.normal(key, (2, 77, cfg.cross_attention_dim)) * 0.5
    t = jnp.array([5.0, 10.0])
    params = unet.init(key, x, t, ctx, None)["params"]
    return cfg, unet, params, (x, t, ctx)


def test_conversion_targets_only_quantizable_sites():
    _, _, params, _ = _tiny_unet_params()
    qp = quantize_unet_params_int8(params)
    flat = tu.flatten_dict(qp)
    int8_sites = {p[-2] for p in flat if p[-1] == "kernel"
                  and flat[p].dtype == jnp.int8}
    assert {"to_q", "to_k", "to_v", "to_out_0", "proj", "net_2",
            "conv1", "conv2", "proj_in", "proj_out"} <= int8_sites
    # edge layers and lora stay float
    for p, v in flat.items():
        if "lora" in p or p[0] in ("conv_in", "conv_out"):
            assert v.dtype != jnp.int8, p
    # every int8 kernel has a matching scale leaf
    for p, v in flat.items():
        if p[-1] == "kernel" and v.dtype == jnp.int8:
            assert p[:-1] + ("kernel_scale",) in flat


def test_simple_sample_int8_path():
    """The serving entry (eval.utils_eval.simple_sample / run_demo --int8)
    generates end-to-end with the quantized U-Net."""
    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.eval.utils_eval import simple_sample
    imgs = simple_sample(None, "ddim", ["a cat"], seeds=[0],
                         num_inference_steps=2, batch_size=1,
                         resolution=64, config=PipelineConfig.tiny(),
                         int8=True)
    assert len(imgs) == 1 and imgs[0].size == (64, 64)


def test_unet_forward_with_int8_params():
    """Dtype-driven branch: the same module tree serves bf16 and int8
    param trees; the int8 output tracks f32 closely and stays finite."""
    _, unet, params, (x, t, ctx) = _tiny_unet_params()
    ref = np.asarray(unet.apply({"params": params}, x, t, ctx, None))
    qp = jax.jit(quantize_unet_params_int8)(params)
    out = np.asarray(jax.jit(
        lambda p: unet.apply({"params": p}, x, t, ctx, None))(qp))
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel
    # and the branch actually engaged (outputs differ from exact f32)
    assert np.abs(out - ref).max() > 0


def test_vae_decoder_int8_targets_and_tracks_f32():
    """quantize_vae_decoder_params_int8 hits only decoder resnet/upsample
    convs (encoder + edge nn.Convs untouched) and decode tracks f32."""
    from aqualora_tpu.core.config import VAEConfig
    from aqualora_tpu.models.vae import AutoencoderKL
    from aqualora_tpu.ops.quant import quantize_vae_decoder_params_int8

    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (1, 32, 32, 3), minval=-1, maxval=1)
    params = vae.init(key, img, key)["params"]
    z = vae.apply({"params": params}, img, method="encode")
    ref = np.asarray(vae.apply({"params": params}, z, method="decode"))

    qp = jax.jit(quantize_vae_decoder_params_int8)(params)
    flat = tu.flatten_dict(qp)
    q_paths = [p for p, v in flat.items()
               if p[-1] == "kernel" and v.dtype == jnp.int8]
    assert q_paths and all(p[0] == "decoder" for p in q_paths)
    assert all(p[-2] in ("conv1", "conv2", "conv_shortcut", "conv")
               for p in q_paths)
    for p in q_paths:
        assert p[:-1] + ("kernel_scale",) in flat

    out = np.asarray(jax.jit(
        lambda p: vae.apply({"params": p}, z, method="decode"))(qp))
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel
    assert np.abs(out - ref).max() > 0


def test_simple_sample_int8_vae_token():
    """int8='conv+vae' quantizes both trees through the serving entry."""
    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.eval.utils_eval import simple_sample
    imgs = simple_sample(None, "ddim", ["a cat"], seeds=[0],
                         num_inference_steps=2, batch_size=1,
                         resolution=64, config=PipelineConfig.tiny(),
                         int8="conv+vae")
    assert len(imgs) == 1 and imgs[0].size == (64, 64)
