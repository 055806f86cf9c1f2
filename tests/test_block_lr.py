"""kohya LoRANetwork training extras (train/block_lr.py): block-wise LR
presets + index mapping (lib/lora.py:559-680) and rank dropout
(lib/lora.py:101-112) folded into the diag scale."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aqualora_tpu.train.block_lr import (NUM_OF_BLOCKS, block_index,
                                         parse_lr_weight_list,
                                         rank_dropout_scale,
                                         scale_lora_updates_by_block)


def test_presets_match_kohya_formulas():
    import math
    n = NUM_OF_BLOCKS
    sine = parse_lr_weight_list("sine")
    assert sine == [math.sin(math.pi * (i / (n - 1)) / 2) for i in range(n)]
    cos = parse_lr_weight_list("cosine+0.5")
    assert cos == [math.sin(math.pi * (i / (n - 1)) / 2) + 0.5
                   for i in reversed(range(n))]
    lin = parse_lr_weight_list("linear")
    assert lin[0] == 0.0 and lin[-1] == 1.0
    assert parse_lr_weight_list("zeros+0.25") == [0.25] * n
    # short comma list padded with 1.0 (lib/lora.py:600-609)
    assert parse_lr_weight_list("0.1,0.2") == [0.1, 0.2] + [1.0] * (n - 2)
    assert parse_lr_weight_list(None) is None
    # a typo'd preset warns and disables (kohya lib/lora.py:592-598),
    # instead of an opaque float() ValueError
    assert parse_lr_weight_list("cosin") is None
    assert parse_lr_weight_list("cosine+x") is None     # bad base too
    # scientific notation survives (no '+' pre-splitting of comma lists)
    assert parse_lr_weight_list("1e+2,2")[:2] == [100.0, 2.0]


def test_block_index_matches_kohya():
    # get_block_index: down -> 1+3i+j, mid -> 12, up -> 13+3i+j
    assert block_index(("down_blocks_0", "attentions_0")) == 1
    assert block_index(("down_blocks_0", "attentions_1")) == 2
    assert block_index(("down_blocks_2", "attentions_1")) == 8
    assert block_index(("mid_block", "attentions_0")) == 12
    assert block_index(("up_blocks_1", "attentions_0")) == 16
    assert block_index(("up_blocks_3", "attentions_2")) == 24


def test_update_scaling_applies_per_block():
    updates = {
        "lora": {
            "down_blocks_0": {"attentions_0": {
                "to_q": {"lora": {"down": {"kernel": jnp.ones((2, 2))}}}}},
            "mid_block": {"attentions_0": {
                "to_q": {"lora": {"down": {"kernel": jnp.ones((2, 2))}}}}},
            "up_blocks_3": {"attentions_2": {
                "to_q": {"lora": {"down": {"kernel": jnp.ones((2, 2))}}}}},
        },
        "mapper": {"bit_embeddings": jnp.ones((3, 4))},
    }
    down = [0.5] * NUM_OF_BLOCKS
    tx = scale_lora_updates_by_block(down, 0.25, None)
    out, _ = tx.update(updates, tx.init(updates))
    got = out["lora"]
    np.testing.assert_allclose(np.asarray(
        got["down_blocks_0"]["attentions_0"]["to_q"]["lora"]["down"]["kernel"]),
        0.5)
    np.testing.assert_allclose(np.asarray(
        got["mid_block"]["attentions_0"]["to_q"]["lora"]["down"]["kernel"]),
        0.25)
    np.testing.assert_allclose(np.asarray(
        got["up_blocks_3"]["attentions_2"]["to_q"]["lora"]["down"]["kernel"]),
        1.0)                                 # up weights unset -> 1.0
    np.testing.assert_allclose(np.asarray(out["mapper"]["bit_embeddings"]),
                               1.0)          # non-lora untouched


def test_zero_threshold_kills_block():
    updates = {"lora": {"down_blocks_0": {"attentions_0": {
        "to_q": {"lora": {"down": {"kernel": jnp.ones((2, 2))}}}}}}}
    tx = scale_lora_updates_by_block([0.05] * NUM_OF_BLOCKS, None, None,
                                     zero_threshold=0.1)
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(np.asarray(
        out["lora"]["down_blocks_0"]["attentions_0"]["to_q"]["lora"]["down"]
        ["kernel"]), 0.0)


def test_rank_dropout_mask_and_rescale():
    key = jax.random.PRNGKey(0)
    diag = jnp.ones((64, 320))
    out = rank_dropout_scale(key, diag, 0.3)
    vals = np.unique(np.round(np.asarray(out), 5))
    # entries are either dropped (0) or rescaled by 1/(1-p)
    np.testing.assert_allclose(sorted(vals), [0.0, round(1 / 0.7, 5)],
                               atol=1e-5)
    frac = float((np.asarray(out) == 0).mean())
    assert 0.25 < frac < 0.35
    np.testing.assert_allclose(np.asarray(rank_dropout_scale(key, diag,
                                                             0.0)), 1.0)


def _lora_dense_fixture(module_dropout=0.0, dropout=0.0):
    """A LoRADense with a non-inert (perturbed-up) LoRA branch."""
    from flax import traverse_util as tu
    from aqualora_tpu.core.config import LoRAConfig
    from aqualora_tpu.models.lora import LoRADense
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8))
    mod = LoRADense(features=6, lora=LoRAConfig(
        rank=4, module_dropout=module_dropout, dropout=dropout))
    params = mod.init({"params": key}, x, jnp.ones((2, 4)))["params"]
    flat = dict(tu.flatten_dict(params))
    up = ("lora", "up", "kernel")
    flat[up] = jax.random.normal(jax.random.PRNGKey(1), flat[up].shape)
    return mod, tu.unflatten_dict(flat), x


def test_module_dropout_gates_whole_lora_delta():
    """kohya module_dropout (lib/lora.py:89-91): p=1 with a training rng
    drops the full delta (NO rescale); no rng (inference) leaves LoRA on;
    p=0 is a no-op."""
    mod0, params, x = _lora_dense_fixture(module_dropout=0.0)
    scale = jnp.ones((2, 4))
    base = mod0.apply({"params": params}, x, None)         # LoRA skipped
    full = mod0.apply({"params": params}, x, scale)
    assert np.abs(np.asarray(full - base)).max() > 1e-4

    mod1, _, _ = _lora_dense_fixture(module_dropout=1.0)
    dropped = mod1.apply({"params": params}, x, scale,
                         rngs={"lora_dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(dropped), np.asarray(base),
                               atol=1e-6)
    # no rng supplied -> inference semantics -> dropout inert
    kept = mod1.apply({"params": params}, x, scale)
    np.testing.assert_allclose(np.asarray(kept), np.asarray(full), atol=1e-6)


def test_module_dropout_draws_independently_per_site():
    """Two sites in one model must not share the Bernoulli draw (make_rng
    folds the module path).  With p=0.5 some key yields exactly one of the
    two sites dropped -> output strictly between all-on and all-off."""
    import flax.linen as nn
    from aqualora_tpu.core.config import LoRAConfig
    from aqualora_tpu.models.lora import LoRADense

    def build(p):
        class Two(nn.Module):
            @nn.compact
            def __call__(self, x, scale):
                cfg = LoRAConfig(rank=4, module_dropout=p)
                h = LoRADense(features=8, lora=cfg, name="a")(x, scale)
                return LoRADense(features=8, lora=cfg, name="b")(h, scale)
        return Two()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8))
    scale = jnp.ones((2, 4))
    m = build(0.0)
    params = m.init({"params": key}, x, scale)["params"]
    from flax import traverse_util as tu
    flat = dict(tu.flatten_dict(params))
    for k in list(flat):
        if k[-3:] == ("lora", "up", "kernel"):
            flat[k] = jax.random.normal(jax.random.PRNGKey(sum(map(len, k))),
                                        flat[k].shape)
    params = tu.unflatten_dict(flat)
    full = np.asarray(m.apply({"params": params}, x, scale))
    off = np.asarray(m.apply({"params": params}, x, None))
    mhalf = build(0.5)
    outs = {np.abs(np.asarray(
        mhalf.apply({"params": params}, x, scale,
                    rngs={"lora_dropout": jax.random.PRNGKey(s)})) - full
        ).max() > 1e-6 for s in range(16)}
    # across 16 keys both "identical to full" and "differs" must occur;
    # a shared draw could never produce partial configurations with
    # intermediate outputs, but the strongest signal is simply that
    # differing draws happen at all alongside all-kept draws
    assert outs == {True, False}
    del off


def test_elementwise_lora_dropout_masks_down_activations():
    """kohya plain dropout (lib/lora.py:96-97): active only with rng,
    1/(1-p) rescale keeps the expectation."""
    mod, params, x = _lora_dense_fixture(dropout=0.5)
    scale = jnp.ones((2, 4))
    ref = mod.apply({"params": params}, x, scale)   # no rng -> inert
    outs = [np.asarray(mod.apply({"params": params}, x, scale,
                                 rngs={"lora_dropout": jax.random.PRNGKey(s)}))
            for s in range(64)]
    assert any(np.abs(o - np.asarray(ref)).max() > 1e-5 for o in outs)
    # mean over draws approaches the undropped output (rescale correctness)
    np.testing.assert_allclose(np.mean(outs, axis=0), np.asarray(ref),
                               atol=0.35)


def test_dropout_flags_reach_text_encoder_lora():
    """kohya network dropouts cover every LoRA module — with
    --train_text_encoder the TE LoRA config must carry them too."""
    from aqualora_tpu.train import ppft_train
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--train_text_encoder", "--module_dropout", "0.3",
         "--lora_dropout", "0.1"])
    cfg, _, _ = ppft_train.build_configs(args)
    assert cfg.unet.lora.module_dropout == 0.3
    assert cfg.unet.lora.dropout == 0.1
    assert cfg.clip.lora.module_dropout == 0.3
    assert cfg.clip.lora.dropout == 0.1


def test_trainer_accepts_extras(tmp_path):
    """--rank_dropout/--module_dropout/--lora_dropout + block-wise LR
    train end-to-end (tiny, 2 steps)."""
    from aqualora_tpu.train import ppft_train
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", str(tmp_path), "--rank_dropout", "0.2",
         "--module_dropout", "0.3", "--lora_dropout", "0.1",
         "--down_lr_weight", "sine", "--mid_lr_weight", "0.5",
         "--up_lr_weight", "cosine", "--validation_epochs", "0",
         "--checkpointing_steps", "100", "--seed", "0"])
    result = ppft_train.run(args)
    assert np.isfinite(result["history"][-1]["ppft_loss"])
