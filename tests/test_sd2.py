"""SD-2.x family support: v-prediction path + penultimate CLIP layer +
64-dim attention heads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.core.config import (CLIPTextConfig, PipelineConfig,
                                      ScheduleConfig, UNetConfig)
from aqualora_tpu.diffusion.schedule import NoiseSchedule

KEY = jax.random.PRNGKey(0)


def test_v_prediction_roundtrip():
    """velocity_to_epsilon(get_velocity(...)) recovers epsilon exactly
    (cschedulers.py:56-72)."""
    s = NoiseSchedule.create(ScheduleConfig(prediction_type="v_prediction"))
    x0 = jax.random.normal(KEY, (4, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 300, 700, 950])
    xt = s.add_noise(x0, eps, t)
    v = s.get_velocity(x0, eps, t)
    eps_back = s.velocity_to_epsilon(v, xt, t)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps),
                               atol=1e-5)
    x0_back = s.pred_original(v, xt, t, "v_prediction")
    np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0),
                               atol=1e-5)


def test_sd21_head_dims():
    cfg = UNetConfig.sd21()
    assert cfg.heads_for(320) == 5
    assert cfg.heads_for(640) == 10
    assert cfg.heads_for(1280) == 20
    assert cfg.cross_attention_dim == 1024
    assert cfg.prediction_type == "v_prediction"


def test_penultimate_clip_changes_output():
    cfg = CLIPTextConfig.tiny()
    cfg_pen = dataclasses.replace(cfg, penultimate=True)
    from aqualora_tpu.models.clip import CLIPTextModel
    ids = jnp.ones((1, 77), jnp.int32)
    m1, m2 = CLIPTextModel(cfg), CLIPTextModel(cfg_pen)
    p = m1.init(KEY, ids)       # same params work for both (same tree)
    o1 = m1.apply(p, ids)
    o2 = m2.apply(p, ids)
    assert o1.shape == o2.shape
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-5


def test_sd21_unet_v_pred_pipeline_tiny():
    """A v-prediction tiny pipeline generates finite images."""
    import dataclasses as dc

    from aqualora_tpu.core.tokenizer import FallbackTokenizer
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
    cfg = PipelineConfig.tiny()
    cfg = dc.replace(cfg,
                     unet=dc.replace(cfg.unet,
                                     prediction_type="v_prediction"),
                     schedule=ScheduleConfig(prediction_type="v_prediction"))
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(KEY, 32, 32)
    tok = FallbackTokenizer(cfg.clip.vocab_size)
    ids = jnp.asarray(tok(["x"]))
    gen = pipe.make_generate(num_steps=2, sampler="ddim", height=32, width=32)
    imgs = gen(params, ids, ids, KEY, 5.0, None)
    assert np.isfinite(np.asarray(imgs)).all()
