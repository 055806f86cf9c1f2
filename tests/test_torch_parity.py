"""Numerical parity against PyTorch reference implementations
(SURVEY.md §4(b)).  transformers is installed (torch CPU), so the CLIP
text encoder — the one SD tower with an importable reference available in
this environment — is checked end-to-end on identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aqualora_tpu.core import io
from aqualora_tpu.core.config import CLIPTextConfig
from aqualora_tpu.models.clip import CLIPTextModel


def _torch_clip(cfg: CLIPTextConfig):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act, layer_norm_eps=cfg.layer_norm_eps,
    )
    torch.manual_seed(0)
    return HFModel(hf_cfg).eval()


def _strip(state):
    out = {}
    for k, v in state.items():
        if "position_ids" in k:
            continue
        k = k.replace("text_model.", "").replace("encoder.", "")
        k = k.replace("embeddings.", "")
        out[k] = v.detach().numpy()
    return out


@pytest.mark.parametrize("act", ["quick_gelu"])
def test_clip_text_parity_with_transformers(act):
    import torch
    cfg = CLIPTextConfig(vocab_size=512, hidden_size=64,
                         intermediate_size=128, num_layers=3, num_heads=4,
                         hidden_act=act)
    hf = _torch_clip(cfg)
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 77))

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    ours = CLIPTextModel(cfg)
    template = ours.init(jax.random.PRNGKey(0),
                         jnp.asarray(ids, jnp.int32))["params"]
    loaded = io.torch_state_to_flax_params(_strip(hf.state_dict()))
    params = io.assign_into(template, loaded)
    out = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4,
                               err_msg="CLIP text encoder diverges from "
                                       "the transformers reference")


def test_efficientnet_import_shapes():
    """Synthetic torchvision-B1-layout state dict imports into our model
    (full numerical parity needs torchvision, absent in this image)."""
    from aqualora_tpu.core.config import EfficientNetConfig
    from aqualora_tpu.models.efficientnet import EfficientNet
    from aqualora_tpu.tools.torch_import import efficientnet_b1_from_torch
    from flax import traverse_util as tu

    cfg = EfficientNetConfig.b1(num_classes=96)
    model = EfficientNet(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), False))

    # build the synthetic torch state from our own shapes (inverse transforms)
    flat_p = tu.flatten_dict(shapes["params"])
    flat_s = tu.flatten_dict(shapes.get("batch_stats", {}))
    st = {}

    def conv_back(path_prefix, torch_key, leaf):
        st[torch_key] = np.zeros(
            (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1]),
            np.float32)

    from aqualora_tpu.models.efficientnet import _B0_STAGES, _round_repeats

    def put(torch_conv, torch_bn, fpath):
        conv_back(fpath, torch_conv, flat_p[fpath + ("conv", "kernel")])
        for nm in ("weight", "bias"):
            st[f"{torch_bn}.{nm}"] = np.zeros(
                flat_p[fpath + ("bn", "scale")].shape, np.float32)
        for nm in ("running_mean", "running_var"):
            st[f"{torch_bn}.{nm}"] = np.ones(
                flat_s[fpath + ("bn", "mean")].shape, np.float32)

    put("features.0.0.weight", "features.0.1", ("stem",))
    for si, (er, ch, reps, stride, kernel) in enumerate(_B0_STAGES):
        for bi in range(_round_repeats(reps, cfg.depth_mult)):
            t = f"features.{si + 1}.{bi}.block"
            f = (f"blocks_{si}_{bi}",)
            if er == 1:
                put(f"{t}.0.0.weight", f"{t}.0.1", f + ("depthwise",))
                se, proj = f"{t}.1", f"{t}.2"
            else:
                put(f"{t}.0.0.weight", f"{t}.0.1", f + ("expand",))
                put(f"{t}.1.0.weight", f"{t}.1.1", f + ("depthwise",))
                se, proj = f"{t}.2", f"{t}.3"
            for fc in ("fc1", "fc2"):
                leaf = flat_p[f + ("se", fc, "kernel")]
                st[f"{se}.{fc}.weight"] = np.zeros(
                    (leaf.shape[3], leaf.shape[2], 1, 1), np.float32)
                st[f"{se}.{fc}.bias"] = np.zeros(
                    flat_p[f + ("se", fc, "bias")].shape, np.float32)
            put(f"{proj}.0.weight", f"{proj}.1", f + ("project",))
    put("features.8.0.weight", "features.8.1", ("head",))
    st["classifier.1.weight"] = np.zeros(
        tuple(reversed(flat_p[("classifier", "kernel")].shape)), np.float32)
    st["classifier.1.bias"] = np.zeros(
        flat_p[("classifier", "bias")].shape, np.float32)

    params, stats = efficientnet_b1_from_torch(st, cfg, prefix="")
    got_p = tu.flatten_dict(params)
    got_s = tu.flatten_dict(stats)
    for k, leaf in flat_p.items():
        assert k in got_p, f"missing param {k}"
        assert tuple(got_p[k].shape) == tuple(leaf.shape), k
    for k, leaf in flat_s.items():
        assert k in got_s, f"missing stat {k}"
