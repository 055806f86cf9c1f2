"""Tensor-parallel partition specs: rule coverage + sharded forward parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from aqualora_tpu.parallel.partition import _spec_for, unet_partition_specs


def test_spec_rules():
    assert _spec_for(("down_blocks_0", "attentions_0", "transformer_blocks_0",
                      "attn1", "to_q", "kernel")) == P(None, "model")
    assert _spec_for(("mid_block", "attentions_0", "transformer_blocks_0",
                      "attn2", "to_out_0", "kernel")) == P("model", None)
    assert _spec_for(("up_blocks_1", "attentions_0", "transformer_blocks_0",
                      "ff", "net_0", "proj", "kernel")) == P(None, "model")
    assert _spec_for(("up_blocks_1", "attentions_0", "transformer_blocks_0",
                      "ff", "net_2", "kernel")) == P("model", None)
    # lora, convs, norms replicated
    assert _spec_for(("attn1", "to_q", "lora", "down", "kernel")) == P()
    assert _spec_for(("conv_in", "kernel")) == P()
    assert _spec_for(("norm1", "scale")) == P()


def test_fsdp_spec_rules():
    """core/sharding.fsdp_spec: shard the largest divisible dim, replicate
    small leaves and leaves with no divisible dim (the ZeRO-1 policy every
    --fsdp trainer and the dryrun FSDP leg rely on)."""
    import numpy as np

    from aqualora_tpu.core import sharding as sh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device conftest")
    mesh = sh.make_mesh(jax.devices())          # data axis = 8
    big = np.zeros((320, 2048), np.float32)
    assert sh.fsdp_spec(big, mesh) == P(None, "data")     # largest dim
    tall = np.zeros((4096, 30), np.float32)
    assert sh.fsdp_spec(tall, mesh) == P("data", None)
    # small leaves (norm scales, Adam counts) replicate: < 16 KiB
    assert sh.fsdp_spec(np.zeros((320,), np.float32), mesh) == P()
    assert sh.fsdp_spec(np.zeros((), np.int32), mesh) == P()
    # no dimension divisible by 8 -> replicate rather than crash
    assert sh.fsdp_spec(np.zeros((77, 1023, 9), np.float32), mesh) == P()
    # one-device mesh -> always replicated
    one = sh.make_mesh(jax.devices()[:1])
    assert sh.fsdp_spec(big, one) == P()


def test_tp_sharded_forward_matches_replicated():
    """UNet forward with TP-sharded params == replicated params."""
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    from aqualora_tpu.core import sharding as sh
    from aqualora_tpu.core.config import PipelineConfig
    from aqualora_tpu.models.unet import UNet2DConditionModel
    from aqualora_tpu.parallel.partition import shard_params

    cfg = PipelineConfig.tiny().unet
    unet = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 4))
    ctx = jax.random.normal(key, (2, 77, cfg.cross_attention_dim))
    t = jnp.array([5, 10])
    scale = jnp.ones((2, cfg.lora.rank))
    params = unet.init(key, x, t, ctx, scale)["params"]

    ref = unet.apply({"params": params}, x, t, ctx, scale)

    mesh = sh.make_mesh(jax.devices()[:2], model=2)
    specs = unet_partition_specs(params)
    sharded = shard_params(mesh, params, specs)
    out = jax.jit(lambda p: unet.apply({"params": p}, x, t, ctx, scale))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)