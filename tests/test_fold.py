"""Device-side LoRA folding == per-step diag scaling (the serving path)."""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline

KEY = jax.random.PRNGKey(0)


def test_fold_message_equals_runtime_scale():
    pipe = StableDiffusionPipeline(PipelineConfig.tiny())
    params = pipe.init_params(KEY, 32, 32)
    # nonzero lora ups so folding matters
    flat = tu.flatten_dict(params["unet"])
    for k in flat:
        if "lora" in k:
            flat[k] = jax.random.normal(jax.random.PRNGKey(len(str(k))),
                                        flat[k].shape) * 0.1
    params["unet"] = tu.unflatten_dict(flat)

    bits = pipe.config.watermark.msg_bits
    msg = jax.random.bernoulli(KEY, 0.5, (bits,)).astype(jnp.float32)
    diag = pipe.message_scale(params, msg.reshape(1, -1))

    x = jax.random.normal(KEY, (1, 8, 8, 4))
    ctx = jax.random.normal(KEY, (1, 77, pipe.config.unet.cross_attention_dim))
    t = jnp.array([100])
    out_runtime = pipe.unet.apply({"params": params["unet"]}, x, t, ctx, diag)

    folded = pipe.fold_message(params, msg)
    out_folded = pipe.unet.apply({"params": folded["unet"]}, x, t, ctx, None)
    np.testing.assert_allclose(np.asarray(out_runtime),
                               np.asarray(out_folded), atol=2e-3, rtol=1e-3)
    # and the fold must actually change the output vs no-lora
    out_base = pipe.unet.apply({"params": params["unet"]}, x, t, ctx, None)
    assert np.abs(np.asarray(out_folded - out_base)).max() > 1e-4
