"""Multi-chip numerics: the dryrun gate + DP/TP train-step equivalence.

Certifies what the reference's accelerate/NCCL DDP step guarantees
(`train/ppft_train.py:987-1068`): one optimizer update computed with the
batch sharded over N devices (and optionally the attention/ff kernels
tensor-sharded) equals the single-device update on the same global batch
and PRNG key — i.e. the ICI all-reduce carries correct, non-zero grads.

Weights are made non-degenerate first (tools/synthetic_artifacts.
perturb_zero_init): with zero-init LoRA-up and secret-conv the loss and
every gradient are exactly 0, which certifies nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import traverse_util as tu
from jax.sharding import NamedSharding, PartitionSpec as P

from aqualora_tpu.core import sharding as sh
from aqualora_tpu.core.config import PipelineConfig
from aqualora_tpu.diffusion.pipeline import StableDiffusionPipeline
from aqualora_tpu.models.watermark import SecretEncoder
from aqualora_tpu.tools.synthetic_artifacts import perturb_zero_init
from aqualora_tpu.train.ppft_train import make_train_step, split_lora

RES = 32


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig.tiny()
    pipe = StableDiffusionPipeline(cfg)
    latent_res = RES // cfg.vae.downscale
    sec_encoder = SecretEncoder(cfg.watermark.msg_bits,
                                cfg.watermark.secret_grid, latent_res,
                                cfg.vae.latent_channels)
    key = jax.random.PRNGKey(0)
    params = pipe.init_params(key, height=RES, width=RES)
    sec_params = sec_encoder.init(
        key, jnp.zeros((1, latent_res, latent_res, cfg.vae.latent_channels)),
        jnp.zeros((1, cfg.watermark.msg_bits)))["params"]

    base_flat, lora_flat = split_lora(params["unet"])
    # host-numpy copies so each mesh run starts from identical weights
    # (train_step donates trainable/opt_state)
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    trainable = to_np({"lora": perturb_zero_init(tu.unflatten_dict(lora_flat)),
                       "mapper": params["mapper"]})
    frozen = to_np({"vae": params["vae"],
                    "text_encoder": params["text_encoder"],
                    "sec_encoder": perturb_zero_init(sec_params, seed=1)})
    base_flat = to_np(base_flat)

    tx = optax.adamw(1e-3)
    train_step = make_train_step(pipe, sec_encoder, tx,
                                 cfg.watermark.msg_bits)
    b = 8
    pixels = np.random.default_rng(0).uniform(
        -1, 1, (b, RES, RES, 3)).astype(np.float32)
    ids = np.ones((b, 77), np.int32)
    return dict(trainable=trainable, frozen=frozen, base_flat=base_flat,
                tx=tx, train_step=train_step, pixels=pixels, ids=ids)


def _run_step(s, mesh, tp_specs=None, fsdp=False):
    """One PPFT update on `mesh`; returns (updated trainable, metrics)."""
    repl = NamedSharding(mesh, P())
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), t)
    trainable = put(s["trainable"])
    if fsdp:
        frozen = sh.shard_fsdp(mesh, s["frozen"])
        opt_state = sh.shard_fsdp(mesh, s["tx"].init(s["trainable"]))
    else:
        frozen = put(s["frozen"])
        opt_state = put(s["tx"].init(s["trainable"]))
    if tp_specs is not None:
        base = {k: jax.device_put(v, NamedSharding(mesh, tp_specs(k)))
                for k, v in s["base_flat"].items()}
    elif fsdp:
        base = sh.shard_fsdp(mesh, s["base_flat"])
    else:
        base = put(s["base_flat"])
    batch_sh = NamedSharding(mesh, P(sh.DATA_AXIS))
    pixels = jax.device_put(s["pixels"], batch_sh)
    ids = jax.device_put(s["ids"], batch_sh)
    trainable, _, metrics = s["train_step"](
        trainable, opt_state, base, frozen, pixels, ids,
        jax.random.PRNGKey(7))
    jax.block_until_ready(metrics)
    return jax.tree_util.tree_map(np.asarray, trainable), metrics


def test_step_is_nondegenerate(setup):
    """Mirror of the __graft_entry__.dryrun_multichip asserts."""
    mesh = sh.make_mesh(jax.devices()[:8])
    _, metrics = _run_step(setup, mesh)
    assert float(metrics["ppft_loss"]) > 0.0
    assert float(metrics["grad_norm"]) > 0.0


def test_dp8_update_matches_single_device(setup):
    """Same batch + key: 8-device DP update == 1-device update."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    ref, m1 = _run_step(setup, sh.make_mesh(jax.devices()[:1]))
    dp, m8 = _run_step(setup, sh.make_mesh(jax.devices()[:8]))
    np.testing.assert_allclose(float(m8["ppft_loss"]),
                               float(m1["ppft_loss"]), rtol=1e-5)
    flat_r, flat_d = tu.flatten_dict(ref), tu.flatten_dict(dp)
    assert flat_r.keys() == flat_d.keys()
    for k in flat_r:
        np.testing.assert_allclose(flat_d[k], flat_r[k], atol=2e-5,
                                   rtol=1e-4, err_msg="/".join(k))


def test_fsdp8_update_matches_single_device(setup):
    """ZeRO-1/weight-FSDP (`--fsdp`): optimizer moments + frozen weights
    sharded over the data axis (core/sharding.fsdp_spec) give the SAME
    update as the replicated 1-device step — GSPMD's inserted
    all-gathers/reduce-scatters change layout, not numerics."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = sh.make_mesh(jax.devices()[:8])
    # the spec helper really shards something (else this test is DP again)
    specs = [sh.fsdp_spec(v, mesh) for v in setup["base_flat"].values()]
    assert any(sp != P() for sp in specs)
    ref, m1 = _run_step(setup, sh.make_mesh(jax.devices()[:1]))
    fs, m8 = _run_step(setup, mesh, fsdp=True)
    np.testing.assert_allclose(float(m8["ppft_loss"]),
                               float(m1["ppft_loss"]), rtol=1e-5)
    flat_r, flat_f = tu.flatten_dict(ref), tu.flatten_dict(fs)
    assert flat_r.keys() == flat_f.keys()
    for k in flat_r:
        np.testing.assert_allclose(flat_f[k], flat_r[k], atol=2e-5,
                                   rtol=1e-4, err_msg="/".join(k))


def test_fsdp_state_sharding_is_stable(setup):
    """Two consecutive FSDP steps keep the opt_state/trainable shardings
    of their inputs (elementwise update + donation => GSPMD propagates
    the annotation), so step 2 reuses step 1's executable instead of
    recompiling on a layout change."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = sh.make_mesh(jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), t)
    trainable = put(setup["trainable"])
    opt_state = sh.shard_fsdp(mesh, setup["tx"].init(setup["trainable"]))
    base = sh.shard_fsdp(mesh, setup["base_flat"])
    frozen = sh.shard_fsdp(mesh, setup["frozen"])
    in_shardings = jax.tree_util.tree_map(lambda x: x.sharding, opt_state)
    batch_sh = NamedSharding(mesh, P(sh.DATA_AXIS))
    pixels = jax.device_put(setup["pixels"], batch_sh)
    ids = jax.device_put(setup["ids"], batch_sh)
    for i in range(2):
        trainable, opt_state, metrics = setup["train_step"](
            trainable, opt_state, base, frozen, pixels, ids,
            jax.random.PRNGKey(i))
    out_shardings = jax.tree_util.tree_map(lambda x: x.sharding, opt_state)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a == b, in_shardings, out_shardings))
    assert trainable["mapper"] is not None
    assert float(metrics["ppft_loss"]) > 0.0


def test_stage1_dp8_update_matches_single_device():
    """Stage-1 (latent_wm_pretrain) DP equivalence — notably the
    EfficientNet BatchNorm batch_stats must aggregate over the GLOBAL
    sharded batch (GSPMD reduction), not per-shard.

    Uses SGD, not Adam: each MBConv project/bn bias has an ANALYTICALLY
    ZERO gradient (every consumer path re-normalizes per-channel batch
    statistics before any nonlinearity, so a constant channel shift is
    invisible to the loss); the computed grad is ~1e-8 rounding noise
    whose sign depends on cross-device reduction order, and Adam's
    first step amplifies that noise to ~lr/2 (g/(|g|+eps)).  SGD keeps
    the comparison at true gradient scale.  Same artifact exists in the
    torch reference's BN+Adam training; it is noise, not divergence."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import optax as _optax

    from aqualora_tpu.core.config import (EfficientNetConfig, VAEConfig,
                                          WatermarkConfig)
    from aqualora_tpu.train.latent_wm_pretrain import (build_models,
                                                       make_train_step)

    vae_cfg, wm_cfg = VAEConfig.tiny(), WatermarkConfig.tiny()
    models = build_models(vae_cfg, wm_cfg, EfficientNetConfig.tiny())
    res = 64
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, res, res, 3))
    lat = jnp.zeros((1, res // vae_cfg.downscale, res // vae_cfg.downscale,
                     vae_cfg.latent_channels))
    msg = jnp.zeros((1, wm_cfg.msg_bits))
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    frozen = to_np({"vae": models.vae.init(key, img, key)["params"],
                    "lpips": models.lpips.init(key, img, img)["params"]})
    dec_vars = models.sec_decoder.init(key, img)
    params = to_np({"sec_encoder":
                    models.sec_encoder.init(key, lat, msg)["params"],
                    "sec_decoder": dec_vars["params"]})
    batch_stats = to_np(dec_vars.get("batch_stats", {}))
    tx = _optax.sgd(1e-3)
    step = make_train_step(models, tx, wm_cfg.msg_bits)
    ctl = {"wm_scale": jnp.float32(1.0),
           "loss_weights": jnp.asarray((5.0, 1.0, 1.5)),
           "distort_probs": jnp.asarray((1.0, 0, 0, 0, 0, 0.0)),
           "fixinit": jnp.asarray(False), "random_aug": jnp.asarray(False)}
    pixels = np.random.default_rng(1).uniform(
        -1, 1, (8, res, res, 3)).astype(np.float32)

    def run_on(mesh):
        repl = NamedSharding(mesh, P())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), t)
        p, bs, fz = put(params), put(batch_stats), put(frozen)
        opt = put(tx.init(params))
        px = jax.device_put(pixels, NamedSharding(mesh, P(sh.DATA_AXIS)))
        p, bs, _, metrics = step(p, bs, opt, fz, px,
                                 jax.random.PRNGKey(5), put(ctl))
        jax.block_until_ready(metrics)
        return (jax.tree_util.tree_map(np.asarray, p),
                jax.tree_util.tree_map(np.asarray, bs), metrics)

    p1, bs1, m1 = run_on(sh.make_mesh(jax.devices()[:1]))
    p8, bs8, m8 = run_on(sh.make_mesh(jax.devices()[:8]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    assert float(m1["msgloss"]) > 0.0        # non-degenerate step
    for (k, a), b in zip(sorted(tu.flatten_dict(p1).items()),
                         (v for _, v in sorted(tu.flatten_dict(p8).items()))):
        np.testing.assert_allclose(b, a, atol=3e-5, rtol=1e-3,
                                   err_msg="/".join(k))
    for (k, a), b in zip(sorted(tu.flatten_dict(bs1).items()),
                         (v for _, v in sorted(tu.flatten_dict(bs8).items()))):
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-4,
                                   err_msg="bn:" + "/".join(k))


def test_stage3_dp8_decoder_update_matches_single_device():
    """Stage-3 (rob_enhance_finetune) decoder-only DP equivalence:
    Stage3Noiser's per-image distortion draws and the EfficientNet BN
    stats must be identical whether the image batch is sharded or not.
    SGD for the same zero-gradient-noise reason as the stage-1 test."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import optax as _optax

    from aqualora_tpu.core.config import (EfficientNetConfig,
                                          WatermarkConfig)
    from aqualora_tpu.models.watermark import SecretDecoder
    from aqualora_tpu.train.rob_enhance_finetune import make_decoder_step

    wm_cfg = WatermarkConfig.tiny()
    dec = SecretDecoder(wm_cfg.msg_bits, EfficientNetConfig.tiny())
    res = 64
    key = jax.random.PRNGKey(0)
    dec_vars = dec.init(key, jnp.zeros((1, res, res, 3)))
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    dparams = to_np(dec_vars["params"])
    batch_stats = to_np(dec_vars.get("batch_stats", {}))
    tx = _optax.sgd(1e-3)
    step = make_decoder_step(dec, tx)
    rng = np.random.default_rng(4)
    images01 = rng.uniform(0, 1, (8, res, res, 3)).astype(np.float32)
    msg = (rng.uniform(size=(8, wm_cfg.msg_bits)) > 0.5).astype(np.float32)

    def run_on(mesh):
        repl = NamedSharding(mesh, P())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), t)
        p, bs = put(dparams), put(batch_stats)
        opt = put(tx.init(dparams))
        data = NamedSharding(mesh, P(sh.DATA_AXIS))
        p, bs, _, metrics = step(p, bs, opt,
                                 jax.device_put(images01, data),
                                 jax.device_put(msg, data),
                                 jax.random.PRNGKey(11))
        jax.block_until_ready(metrics)
        return (jax.tree_util.tree_map(np.asarray, p),
                jax.tree_util.tree_map(np.asarray, bs), metrics)

    p1, bs1, m1 = run_on(sh.make_mesh(jax.devices()[:1]))
    p8, bs8, m8 = run_on(sh.make_mesh(jax.devices()[:8]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    assert float(m1["loss"]) > 0.0
    for (k, a), b in zip(sorted(tu.flatten_dict(p1).items()),
                         (v for _, v in sorted(tu.flatten_dict(p8).items()))):
        np.testing.assert_allclose(b, a, atol=3e-5, rtol=1e-3,
                                   err_msg="/".join(k))
    for (k, a), b in zip(sorted(tu.flatten_dict(bs1).items()),
                         (v for _, v in sorted(tu.flatten_dict(bs8).items()))):
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-4,
                                   err_msg="bn:" + "/".join(k))


def test_dp4_tp2_update_matches_single_device(setup):
    """4x2 data x model mesh (TP attention/ff kernels) == 1-device."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from aqualora_tpu.parallel.partition import _spec_for
    ref, m1 = _run_step(setup, sh.make_mesh(jax.devices()[:1]))
    tp, mtp = _run_step(setup, sh.make_mesh(jax.devices()[:8], model=2),
                        tp_specs=_spec_for)
    np.testing.assert_allclose(float(mtp["ppft_loss"]),
                               float(m1["ppft_loss"]), rtol=1e-4)
    flat_r, flat_t = tu.flatten_dict(ref), tu.flatten_dict(tp)
    for k in flat_r:
        np.testing.assert_allclose(flat_t[k], flat_r[k], atol=5e-5,
                                   rtol=1e-3, err_msg="/".join(k))


def test_graft_entry_traces():
    """The driver's single-chip compile check target: entry() must return
    a traceable (fn, args) pair.  eval_shape traces the full rank-320
    SD-1.5 U-Net forward without compiling (CPU-cheap), catching any
    signature/shape regression in the exact function the driver runs."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    latents = args[1]
    assert out.shape == latents.shape  # eps prediction, NHWC latent shape
    assert out.dtype == jnp.float32    # final conv promotes to f32
