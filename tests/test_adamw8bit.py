"""Blockwise 8-bit AdamW (train/adamw8bit.py) — the TPU-native stand-in
for bitsandbytes AdamW8bit (`--use_8bit_adam`, ppft_train.py:760-771)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqualora_tpu.train.adamw8bit import (AdamW8bitState, adamw8bit,
                                          dequantize, quantize)


def test_quantize_roundtrip():
    rng = np.random.RandomState(0)
    for shape, signed in [((5, 37), True), ((1000,), False), ((3, 3, 3, 7),
                                                              True)]:
        x = jnp.asarray(rng.randn(*np.atleast_1d(shape)).astype(np.float32))
        if not signed:
            x = jnp.abs(x)
        q = quantize(x, signed)
        assert q.code.dtype == jnp.int8
        back = dequantize(q, signed)
        assert back.shape == x.shape
        # blockwise linear codes: error bounded by scale/2 per element
        tol = float(jnp.max(jnp.abs(x))) / (127 if signed else 255)
        assert float(jnp.max(jnp.abs(back - x))) <= tol + 1e-6


def test_tracks_adamw_on_quadratic():
    """8-bit state optimizes a quadratic to (near) the same optimum."""
    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params8 = {"w": jnp.zeros((300,)), "b": jnp.zeros((7,))}
    params32 = jax.tree_util.tree_map(jnp.copy, params8)
    tx8 = adamw8bit(1e-1, weight_decay=0.0)
    tx32 = optax.adamw(1e-1, weight_decay=0.0)
    s8, s32 = tx8.init(params8), tx32.init(params32)

    def make_step(tx):
        @jax.jit
        def step(params, s):
            g = jax.grad(loss)(params)
            u, s = tx.update(g, s, params)
            return optax.apply_updates(params, u), s
        return step

    step8, step32 = make_step(tx8), make_step(tx32)
    for _ in range(120):
        params8, s8 = step8(params8, s8)
        params32, s32 = step32(params32, s32)
    assert float(loss(params8)) < 1e-2
    np.testing.assert_allclose(np.asarray(params8["w"]),
                               np.asarray(params32["w"]), atol=0.05)


def test_schedule_alignment_with_optax():
    """First update evaluates schedule(0) like optax.scale_by_schedule —
    with a warmup ramp starting at 0 the first step must be a no-op in
    both optimizers (no off-by-one)."""
    schedule = lambda c: 0.1 * jnp.minimum(c, 5.0) / 5.0
    params = {"w": jnp.ones((13,))}
    g = {"w": jnp.full((13,), 0.5)}
    tx8, tx32 = (adamw8bit(schedule, weight_decay=0.0),
                 optax.adamw(schedule, weight_decay=0.0))
    s8, s32 = tx8.init(params), tx32.init(params)
    for step in range(3):
        u8, s8 = tx8.update(g, s8, params)
        u32, s32 = tx32.update(g, s32, params)
        np.testing.assert_allclose(np.asarray(u8["w"]), np.asarray(u32["w"]),
                                   atol=1e-6, err_msg=f"step {step}")
    assert float(jnp.abs(u8["w"]).max()) > 0  # ramp engaged by step 3


def test_state_is_int8_and_jittable():
    params = {"a": jnp.ones((1000, 3))}
    tx = adamw8bit(1e-3)
    state = tx.init(params)
    assert isinstance(state, AdamW8bitState)
    assert all(q.code.dtype == jnp.int8 for q in state.m + state.v)
    # state memory: int8 codes + one f32 scale per 256 elements (~4x less)
    n = 1000 * 3
    code_bytes = sum(q.code.size for q in state.m)
    assert code_bytes <= n + 256

    @jax.jit
    def one(params, state):
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state

    p2, s2 = one(params, state)
    assert s2.count == 1 and not np.allclose(np.asarray(p2["a"]), 1.0)


def test_ppft_trainer_uses_it(tmp_path):
    """--use_8bit_adam trains end-to-end (tiny, 2 steps)."""
    from aqualora_tpu.train import ppft_train
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", str(tmp_path), "--use_8bit_adam",
         "--validation_epochs", "0", "--seed", "0",
         "--checkpointing_steps", "100"])
    result = ppft_train.run(args)
    assert np.isfinite(result["history"][-1]["ppft_loss"])


def test_state_checkpoint_roundtrip(tmp_path):
    """The int8 optimizer state survives orbax save/restore (resume with
    --use_8bit_adam)."""
    from aqualora_tpu.core.checkpoint import load_pytree, save_pytree

    params = {"w": jnp.linspace(-1, 1, 500).reshape(50, 10)}
    tx = adamw8bit(1e-2)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = tx.update(g, state, params)

    path = str(tmp_path / "opt")
    save_pytree(path, state)
    restored = load_pytree(path, state)
    assert int(restored.count) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues optimizing identically
    u1, _ = tx.update(g, state, params)
    u2, _ = tx.update(g, restored, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]))
