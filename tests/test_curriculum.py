"""Stage-1 warmup curriculum transition + stage-3 bucket compile stability
(VERDICT round-1 weak #8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_stage1_warmup_exit_fires(tmp_path, monkeypatch):
    """The msgloss<0.1-for-10-batches exit (latent_wm_pretrain.py:197-204):
    wm_scale 0.03 + fixinit + msg-only weights during warmup, then
    wm_scale 1.0 + fixinit off right after the 10th low-loss batch."""
    from aqualora_tpu.train import latent_wm_pretrain as s1

    seen = []

    def fake_make_train_step(models, optimizer, msg_bits, **kw):
        def step(params, batch_stats, opt_state, frozen, images, key, ctl):
            seen.append({k: np.asarray(v) for k, v in ctl.items()})
            metrics = {"loss": jnp.float32(0.05),
                       "lpips_loss": jnp.float32(0.0),
                       "msgloss": jnp.float32(0.05),   # always "warmed up"
                       "prvl_loss": jnp.float32(0.0),
                       "acc": jnp.float32(1.0)}
            return params, batch_stats, opt_state, metrics
        return step

    monkeypatch.setattr(s1, "make_train_step", fake_make_train_step)
    monkeypatch.setattr(s1, "make_eval_step",
                        lambda models, bits: lambda *a: jnp.float32(1.0))

    args = s1.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "14", "--batch_size", "2",
         "--output_dir", str(tmp_path), "--seed", "0"])
    s1.run(args)

    assert len(seen) >= 12
    for c in seen[:10]:              # warmup: scale 0.03, fixinit, msg-only
        assert c["wm_scale"] == np.float32(0.03)
        assert bool(c["fixinit"])
        np.testing.assert_array_equal(c["loss_weights"], [0.0, 1.0, 0.0])
    for c in seen[10:]:              # exited after the 10th low-loss batch
        assert c["wm_scale"] == np.float32(1.0)
        assert not bool(c["fixinit"])


def test_stage1_no_warmup_flag(tmp_path, monkeypatch):
    """--warmup 0 starts at full scale immediately."""
    from aqualora_tpu.train import latent_wm_pretrain as s1
    seen = []

    def fake_make_train_step(models, optimizer, msg_bits, **kw):
        def step(params, batch_stats, opt_state, frozen, images, key, ctl):
            seen.append(float(ctl["wm_scale"]))
            z = jnp.float32(0.5)
            return params, batch_stats, opt_state, dict(
                loss=z, lpips_loss=z, msgloss=z, prvl_loss=z, acc=z)
        return step

    monkeypatch.setattr(s1, "make_train_step", fake_make_train_step)
    monkeypatch.setattr(s1, "make_eval_step",
                        lambda models, bits: lambda *a: jnp.float32(1.0))
    args = s1.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--batch_size", "2",
         "--warmup", "0", "--output_dir", str(tmp_path)])
    s1.run(args)
    assert seen and all(s == 1.0 for s in seen)


@pytest.mark.slow
def test_stage3_buckets_do_not_retrace():
    """Per-bucket generators compile once; repeated steps at the same
    resolution reuse the trace (the SURVEY §7 bucketed-shapes answer)."""
    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline

    cfg = PipelineConfig.tiny()
    pipe = StableDiffusionPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0), height=32, width=32)
    resolutions = (32, 48)
    gens = {r: pipe.make_generate(num_steps=2, sampler="dpms_m",
                                  height=r, width=r) for r in resolutions}
    ids = jnp.ones((1, 77), jnp.int32)
    diag = jnp.ones((1, cfg.unet.lora.rank), jnp.float32)
    for trial in range(3):           # 3 "steps" per bucket
        for r in resolutions:
            gens[r](params, ids, ids, jax.random.PRNGKey(trial), 7.5, diag)
    for r in resolutions:
        assert gens[r]._cache_size() == 1, (
            f"bucket {r} retraced: cache size {gens[r]._cache_size()}")
