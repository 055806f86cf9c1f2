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


def test_trainer_accepts_extras(tmp_path):
    """--rank_dropout + block-wise LR train end-to-end (tiny, 2 steps)."""
    from aqualora_tpu.train import ppft_train
    args = ppft_train.build_argparser().parse_args(
        ["--tiny", "--max_train_steps", "2", "--train_batch_size", "2",
         "--output_dir", str(tmp_path), "--rank_dropout", "0.2",
         "--down_lr_weight", "sine", "--mid_lr_weight", "0.5",
         "--up_lr_weight", "cosine", "--validation_epochs", "0",
         "--checkpointing_steps", "100", "--seed", "0"])
    result = ppft_train.run(args)
    assert np.isfinite(result["history"][-1]["ppft_loss"])
