"""Pallas kernel correctness: flash attention + fused secret injection
(interpret/reference modes on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.ops.attention import _xla_attention


import contextlib


@contextlib.contextmanager
def _interpret_pallas():
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = interp_call
    try:
        yield
    finally:
        pl.pallas_call = orig


def test_flash_attention_matches_xla_interpret():
    """Run the Pallas flash kernel in interpreter mode vs XLA attention."""
    import aqualora_tpu.ops.flash_attention as F

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 256, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 384, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 384, 64))
    scale = 64 ** -0.5

    with _interpret_pallas():
        out = F._flash_forward(q, k, v, scale)
    ref = _xla_attention(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_backward_matches_xla_interpret():
    """dq/dk/dv from the Pallas backward kernels vs jax.vjp of XLA attn."""
    import aqualora_tpu.ops.flash_attention as F

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 256, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 128, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 128, 64))
    g = jax.random.normal(jax.random.PRNGKey(3), q.shape)
    scale = 64 ** -0.5

    with _interpret_pallas():
        out, res = F._fa_fwd(q, k, v, scale)
        dq, dk, dv = F._fa_bwd(scale, res, g)

    ref_fn = lambda q, k, v: _xla_attention(q, k, v, None, scale)
    ref_out, vjp = jax.vjp(ref_fn, q, k, v)
    rdq, rdk, rdv = vjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4)


def test_flash_shapes_gate():
    """Measured policy: XLA wins at SD-1.5 shapes (d=40 pads the lanes);
    flash engages for huge sequences or full-lane head dims."""
    from aqualora_tpu.ops.flash_attention import flash_shapes_ok
    assert flash_shapes_ok((2, 8, 9216, 40), (2, 8, 9216, 40))   # 768px
    assert flash_shapes_ok((2, 8, 1024, 128), (2, 8, 1024, 128))
    # d>=64 & T>=1024: SDPA spills [T,T] (microbench_dpad) — flash wins.
    # Covers every SD-2.1 level (d=64) and SD-1.5's 32^2 d=80 level.
    assert flash_shapes_ok((2, 5, 4096, 64), (2, 5, 4096, 64))   # SD-2.1
    assert flash_shapes_ok((2, 8, 1024, 80), (2, 8, 1024, 80))   # SD-1.5 32^2
    assert not flash_shapes_ok((2, 8, 256, 160), (2, 8, 256, 160))  # short T
    assert not flash_shapes_ok((2, 8, 4096, 40), (2, 8, 4096, 40))  # XLA wins
    assert not flash_shapes_ok((2, 8, 64, 40), (2, 8, 64, 40))      # short
    assert not flash_shapes_ok((2, 8, 4096, 64), (2, 8, 77, 64))    # 77 keys
    assert not flash_shapes_ok((2, 8, 8960, 40), (2, 8, 300, 40))   # unaligned


def test_flash_rejects_unaligned_seq_lens():
    """The public kernel fails loudly on non-128-divisible sequence
    lengths instead of silently truncating the grid (uninitialized
    output rows + dropped keys)."""
    from aqualora_tpu.ops.flash_attention import flash_attention
    q = jnp.zeros((1, 1, 300, 64), jnp.float32)
    k = v = jnp.zeros((1, 1, 300, 64), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        flash_attention(q, k, v, scale=0.125)
    with pytest.raises(ValueError, match="divisible"):
        flash_attention(jnp.zeros((1, 1, 512, 64), jnp.float32),
                        jnp.zeros((1, 1, 77, 64), jnp.float32),
                        jnp.zeros((1, 1, 77, 64), jnp.float32), scale=0.125)


def test_fused_secret_inject_matches_module():
    """The fused op (jnp reference path on CPU) == SecretEncoder module."""
    from aqualora_tpu.models.watermark import SecretEncoder
    from aqualora_tpu.ops.secret_inject import inject_from_params

    enc = SecretEncoder(8, base_res=8, resolution=16)
    key = jax.random.PRNGKey(0)
    latent = jax.random.normal(key, (2, 16, 16, 4))
    msg = jax.random.bernoulli(key, 0.5, (2, 8)).astype(jnp.float32)
    variables = enc.init(key, latent, msg)
    # randomize the zero-init conv so the test is nontrivial
    import flax.traverse_util as tu
    flat = tu.flatten_dict(variables["params"])
    flat[("conv_out", "kernel")] = jax.random.normal(key, (3, 3, 4, 4)) * 0.1
    params = tu.unflatten_dict(flat)

    wm, _ = enc.apply({"params": params}, latent, msg)
    fused = inject_from_params(params, latent, msg, base_res=8)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(wm), atol=1e-5)


def test_fused_secret_inject_grads():
    from aqualora_tpu.ops.secret_inject import fused_secret_inject

    key = jax.random.PRNGKey(0)
    latent = jax.random.normal(key, (1, 16, 16, 4))
    msg = jnp.ones((1, 8))
    dk = jax.random.normal(key, (8, 64)) * 0.1
    db = jnp.zeros((64,))
    ck = jax.random.normal(key, (3, 3, 4, 4)) * 0.1
    cb = jnp.zeros((4,))

    def loss(dk, ck):
        return jnp.sum(fused_secret_inject(latent, msg, dk, db, ck, cb, 8) ** 2)

    g_dk, g_ck = jax.grad(loss, argnums=(0, 1))(dk, ck)
    assert np.isfinite(np.asarray(g_dk)).all()
    assert np.abs(np.asarray(g_dk)).max() > 0
    assert np.abs(np.asarray(g_ck)).max() > 0


def test_attention_impl_context_override():
    """attention_impl() forces the implementation for calls traced inside
    the context (used to mix SDPA teacher + flash student in one step)."""
    import numpy as np

    from aqualora_tpu.ops import attention as A

    q = jnp.asarray(np.random.RandomState(0).randn(1, 2, 8, 4), jnp.float32)
    base = A.dot_product_attention(q, q, q)
    with A.attention_impl("xla"):
        forced = A.dot_product_attention(q, q, q)
    with A.attention_impl("sdpa"):
        sdpa = A.dot_product_attention(q, q, q)
    assert not A._IMPL_OVERRIDE          # context restored
    np.testing.assert_allclose(np.asarray(base), np.asarray(forced),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(base), np.asarray(sdpa), atol=1e-5)


def test_flash_attention_tuned_tiling_interpret():
    """The d<=64 big-q tiling branch (bq=1024/bk=512 at these shapes,
    _block_sizes) computes the same forward and backward as XLA.  The
    full 4096/2048 configuration is additionally verified on-chip
    (docs/PERFORMANCE.md round-2 sweep)."""
    import aqualora_tpu.ops.flash_attention as F

    assert F._block_sizes(1024, 1024, 40) == (1024, 512)
    assert F._block_sizes(4096, 4096, 40) == (2048, 512)
    assert F._block_sizes(9216, 9216, 40) == (512, 1024)   # 768px keeps old
    # d=64 forward override (SD-2.1 serving sweep: 1024/1024 = 10.3 ms vs
    # 2048/512 = 15.6); the backward keeps the training-measured tiling
    # with the scoped-VMEM bq cap applied (dq kernel fails at bq=2048/B16)
    assert F._block_sizes(4096, 4096, 64) == (1024, 1024)
    # d=64 backward: round-3 sweep landed bk=1024 (35.16 vs 35.88 ms full
    # chain at [B16,H8,T4096,d64]; 2048/1024 scoped-VMEM OOMs), with the
    # bq cap still applied.  d=40 keeps the round-2 swept 1024/512.
    assert F._block_sizes(4096, 4096, 64, bwd=True) == (1024, 1024)
    assert F._block_sizes(4096, 4096, 40, bwd=True) == (1024, 512)
    # d=80 forward (SD-1.5 32^2 level, round-3 sweep): 1024/1024 = 1.77 ms
    # vs the old 512/1024 default = 1.92; backward unswept at d=80, keeps
    # the default.
    assert F._block_sizes(1024, 1024, 80) == (1024, 1024)
    assert F._block_sizes(1024, 1024, 80, bwd=True) == (512, 1024)

    # the d=64 fwd override is scope-limited to tq<=4096 like the d<=64
    # training branch: at T=9216 (768px) large-q tilings measured 32%
    # slower, so the big-seq default stays in charge
    assert F._block_sizes(9216, 9216, 64) == (512, 1024)

    # backward-only sweep knobs escape the cap and leave the forward alone
    import os
    os.environ["AQUALORA_FLASH_BQ_BWD"] = "2048"
    os.environ["AQUALORA_FLASH_BK_BWD"] = "1024"
    try:
        assert F._block_sizes(4096, 4096, 64, bwd=True) == (2048, 1024)
        assert F._block_sizes(4096, 4096, 64) == (1024, 1024)
        assert F._block_sizes(4096, 4096, 40, bwd=True) == (2048, 1024)
    finally:
        del os.environ["AQUALORA_FLASH_BQ_BWD"]
        del os.environ["AQUALORA_FLASH_BK_BWD"]

    # forward sweep knobs are forward-ONLY: the backward keeps its own
    # (measured) tiling so a fwd sweep can't silently retile dq/dkv
    os.environ["AQUALORA_FLASH_BQ"] = "512"
    os.environ["AQUALORA_FLASH_BK"] = "1024"
    try:
        assert F._block_sizes(4096, 4096, 40) == (512, 1024)
        assert F._block_sizes(4096, 4096, 40, bwd=True) == (1024, 512)
    finally:
        del os.environ["AQUALORA_FLASH_BQ"]
        del os.environ["AQUALORA_FLASH_BK"]

    # d=40: the training tiling; d=64: the new fwd override; d=160: the
    # wide-head bk-cap branch (d>128 -> bk<=512) reachable via
    # AQUALORA_ATTN_IMPL=flash at SD-1.5's 16^2 level
    for d, t in ((40, 1024), (64, 1024), (160, 256)):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, t, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, t, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, t, d))
        g = jax.random.normal(jax.random.PRNGKey(3), q.shape)
        scale = d ** -0.5

        with _interpret_pallas():
            out, res = F._fa_fwd(q, k, v, scale)
            dq, dk, dv = F._fa_bwd(scale, res, g)
        ref_fn = lambda q, k, v: _xla_attention(q, k, v, None, scale)
        ref_out, vjp = jax.vjp(ref_fn, q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4)


def test_bf16_scores_attention_tracks_f32():
    """bf16-score-materialization serving attention (AQUALORA_ATTN_IMPL=
    bf16_scores): output tracks the f32 einsum reference to ~0.5% and a
    boolean mask is honored."""
    from aqualora_tpu.ops.attention import (_bf16_scores_attention,
                                            _xla_attention)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(kq, (2, 4, 128, 40))
    k = jax.random.normal(kk, (2, 4, 77, 40))
    v = jax.random.normal(kv, (2, 4, 77, 40))
    scale = 40 ** -0.5
    ref = np.asarray(_xla_attention(q, k, v, None, scale))
    out = np.asarray(_bf16_scores_attention(q, k, v, None, scale))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.005, rel
    mask = jnp.arange(77)[None, None, None, :] < 50
    mask = jnp.broadcast_to(mask, (2, 4, 128, 77))
    refm = np.asarray(_xla_attention(q, k, v, mask, scale))
    outm = np.asarray(_bf16_scores_attention(q, k, v, mask, scale))
    relm = np.linalg.norm(outm - refm) / np.linalg.norm(refm)
    assert relm < 0.005, relm


def test_bf16_scores_dispatch_env(monkeypatch):
    """AQUALORA_ATTN_IMPL=bf16_scores routes through the new impl."""
    from aqualora_tpu.ops import attention as A
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64, 16))
    monkeypatch.setenv("AQUALORA_ATTN_IMPL", "bf16_scores")
    out = A.dot_product_attention(q, q, q)
    ref = A._xla_attention(q, q, q, None, 16 ** -0.5)
    rel = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert 0 < rel < 0.005   # bf16 rounding present => the impl engaged


def test_identity_attention_ablation_bound(monkeypatch):
    """The 'identity' impl (ablation-only, scripts/ablate_train.py) must
    (a) produce the true [B,H,Tq,Dv] output shape for self- AND
    cross-attention, and (b) keep the q/k projections live in the
    backward — a dead q/k would make the ablation OVERCOUNT the
    attention category by also removing the projections' cost."""
    from aqualora_tpu.ops import attention as A
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, 4, 32, 8))
    # cross-attention: Tkv != Tq, Dv != Dqk allowed by the bound
    k = jax.random.normal(kk, (2, 4, 7, 8))
    v = jax.random.normal(kv, (2, 4, 7, 16))
    out = A._dispatch_impl(q, k, v, None, 8 ** -0.5, False, "identity")
    assert out.shape == (2, 4, 32, 16)
    out_self = A._dispatch_impl(q, q, q, None, 8 ** -0.5, False, "identity")
    assert out_self.shape == q.shape
    # gradient liveness: dq and dk nonzero (the 1e-30 keep-alive term)
    dq, dk = jax.grad(
        lambda q, k: jnp.sum(
            A._dispatch_impl(q, k, v, None, 8 ** -0.5, False, "identity")
        ), argnums=(0, 1))(q, k)
    assert np.isfinite(np.asarray(dq)).all()
    assert float(jnp.max(jnp.abs(dq))) > 0
    assert float(jnp.max(jnp.abs(dk))) > 0
    # masked call sites (CLIP causal, VAE mid-block) must NOT be
    # replaced: they fall through to the real masked XLA path, keeping
    # the ablation's category boundary at the U-Net's unmasked attention
    mask = jnp.arange(32)[None, None, :, None] >= \
        jnp.arange(32)[None, None, None, :]
    mask = jnp.broadcast_to(mask, (2, 4, 32, 32))
    got = A._dispatch_impl(q, q, q, mask, 8 ** -0.5, False, "identity")
    ref = A._xla_attention(q, q, q, mask, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6)
