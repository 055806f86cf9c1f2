"""Regional multi-LoRA inference (kohya LoRAInfModule counterpart).

The reference capability lives at `scripts/lib/lora.py:120-375`
(LoRAInfModule regional/sub-prompt forwards + mask-weighted to_out
combine).  Our TPU-native design folds each region's LoRA into its own
U-Net tree, vmaps the denoiser over the stacked region weights, and
merges the CFG'd eps predictions with normalized masks
(diffusion/pipeline.py make_regional_generate).
"""

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.core.tokenizer import FallbackTokenizer
from aqualora_tpu.diffusion.pipeline import (stack_region_params,
                                             tiny_pipeline)

KEY = jax.random.PRNGKey(7)


@pytest.fixture(scope="module")
def pipe_params_msgs():
    pipe = tiny_pipeline()
    params = pipe.init_params(KEY, height=32, width=32)
    # non-degenerate LoRA up kernels so folded messages actually differ
    flat = tu.flatten_dict(params["unet"])
    for k in list(flat):
        if "lora" in k and k[-2] == "up":
            flat[k] = jax.random.normal(jax.random.PRNGKey(sum(map(len, k))),
                                        flat[k].shape) * 0.05
    params = dict(params, unet=tu.unflatten_dict(flat))
    bits = pipe.config.watermark.msg_bits
    msg_a = jnp.zeros((bits,))
    msg_b = jnp.ones((bits,))
    return pipe, params, msg_a, msg_b


def _ids(pipe, prompts):
    tok = FallbackTokenizer(pipe.config.clip.vocab_size)
    return jnp.asarray(tok(prompts))


def test_one_hot_mask_matches_single_message_generation(pipe_params_msgs):
    """masks=[BIG, 0] must reproduce plain folded generation for region A
    exactly (up to the kohya +1e-4 mask-denominator, suppressed here by
    the large mask value)."""
    pipe, params, msg_a, msg_b = pipe_params_msgs
    fold_a = pipe.fold_message(params, msg_a)
    fold_b = pipe.fold_message(params, msg_b)
    stack = stack_region_params([fold_a["unet"], fold_b["unet"]])

    ids = _ids(pipe, ["a cat"])
    neg = _ids(pipe, [""])
    prompt_ids = jnp.stack([ids, ids])                 # same prompt per region
    masks = jnp.stack([jnp.full((32, 32), 1e6), jnp.zeros((32, 32))])

    regional = pipe.make_regional_generate(num_steps=2, sampler="ddim",
                                           height=32, width=32)
    out = regional(params, stack, masks, prompt_ids, neg, KEY, 7.5)

    gen = pipe.make_generate(num_steps=2, sampler="ddim",
                             height=32, width=32)
    ref = gen(fold_a, ids, neg, KEY, 7.5, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4)
    # and region B is genuinely different weights: flipping the one-hot
    # mask changes the image
    out_b = regional(params, stack, masks[::-1], prompt_ids, neg, KEY, 7.5)
    assert np.abs(np.asarray(out - out_b)).max() > 1e-5


def test_identical_regions_collapse(pipe_params_msgs):
    """Two regions with identical weights/prompts == one region, for ANY
    mask split (eps_s are equal and the normalized masks sum to ~1)."""
    pipe, params, msg_a, _ = pipe_params_msgs
    fold_a = pipe.fold_message(params, msg_a)
    ids = _ids(pipe, ["x", "y"])
    neg = _ids(pipe, ["", ""])
    regional = pipe.make_regional_generate(num_steps=2, sampler="ddim",
                                           height=32, width=32)

    key = jax.random.PRNGKey(3)
    big = 1e6
    # arbitrary non-uniform split of the same total weight
    col = jnp.linspace(0.25, 0.75, 32)[None, :]
    m1 = jnp.broadcast_to(col, (32, 32)) * big
    masks2 = jnp.stack([m1, big - m1])
    out2 = regional(params,
                    stack_region_params([fold_a["unet"], fold_a["unet"]]),
                    masks2, jnp.stack([ids, ids]), neg, key, 5.0)
    out1 = regional(params, stack_region_params([fold_a["unet"]]),
                    jnp.full((1, 32, 32), big), ids[None], neg, key, 5.0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               atol=5e-4)


def test_per_region_sub_prompts_take_effect(pipe_params_msgs):
    """Different sub-prompt in region B changes the output even when the
    region weights are identical (the attn2-context path of kohya's
    sub_prompt_forward, lib/lora.py:299-316)."""
    pipe, params, msg_a, _ = pipe_params_msgs
    fold_a = pipe.fold_message(params, msg_a)
    stack = stack_region_params([fold_a["unet"], fold_a["unet"]])
    neg = _ids(pipe, [""])
    regional = pipe.make_regional_generate(num_steps=2, sampler="ddim",
                                           height=32, width=32)
    masks = jnp.stack([jnp.full((32, 32), 0.5), jnp.full((32, 32), 0.5)])
    same = regional(params, stack,
                    masks, jnp.stack([_ids(pipe, ["a cat"])] * 2), neg,
                    KEY, 7.5)
    mixed = regional(params, stack, masks,
                     jnp.stack([_ids(pipe, ["a cat"]),
                                _ids(pipe, ["a dog"])]), neg, KEY, 7.5)
    assert np.abs(np.asarray(same - mixed)).max() > 1e-5


def test_mask_region_count_mismatch_raises(pipe_params_msgs):
    """A mask stack whose region count disagrees with prompt_ids must
    raise instead of silently bilinearly blending neighbors' masks
    across the region axis."""
    pipe, params, msg_a, msg_b = pipe_params_msgs
    regional = pipe.make_regional_generate(num_steps=2, height=32,
                                           width=32, jit=False)
    stack = stack_region_params(
        [pipe.fold_message(params, m)["unet"] for m in (msg_a, msg_b)])
    ids = _ids(pipe, ["a", "b"])[:, None, :]           # [2, 1, 77]
    neg = _ids(pipe, [""])
    masks3 = jnp.ones((3, 32, 32))                      # 3 masks, 2 regions
    with pytest.raises(ValueError, match="regions"):
        regional(params, stack, masks3, ids, neg, KEY)


def test_stack_region_params_strips_dead_lora_leaves(pipe_params_msgs):
    """The regional denoiser runs scale=None, so fold_message's retained
    LoRA down/up leaves are dead weight — stack_region_params must not
    duplicate them per region (keep_lora=True opts back in)."""
    pipe, params, msg_a, msg_b = pipe_params_msgs
    folded = [pipe.fold_message(params, m)["unet"] for m in (msg_a, msg_b)]
    stripped = stack_region_params(folded)
    kept = stack_region_params(folded, keep_lora=True)
    assert not any("lora" in k for k in tu.flatten_dict(stripped))
    assert any("lora" in k for k in tu.flatten_dict(kept))
    # non-LoRA leaves identical, each with a leading region axis of 2
    fs, fk = tu.flatten_dict(stripped), tu.flatten_dict(kept)
    assert set(fs) == {k for k in fk if "lora" not in k}
    assert all(v.shape[0] == 2 for v in fs.values())
