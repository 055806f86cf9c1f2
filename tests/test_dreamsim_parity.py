"""Numerical parity of the DreamSim stack against the reference torch code.

Goldens are produced by EXECUTING the reference's pure-torch DINO ViT
(`evaluation/dreamsim/feature_extraction/vision_transformer.py`) on shared
random weights — the strongest available parity evidence without the
published checkpoints.  Skipped when /root/reference is absent.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_REF_VIT = "/root/reference/evaluation/dreamsim/feature_extraction/vision_transformer.py"

pytestmark = pytest.mark.skipif(not os.path.exists(_REF_VIT),
                                reason="reference checkout not available")


def _load_ref_vit():
    spec = importlib.util.spec_from_file_location("ref_vit", _REF_VIT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_torch_vit(depth, clip_variant=False, quick_gelu=False, seed=0):
    """Random-init reference VisionTransformer; optionally apply the
    CLIP-as-DINO munging of load_clip_as_dino.py:21-32 (pos_drop ->
    LayerNorm, QuickGELU, LN eps 1e-5)."""
    import functools

    import torch
    ref = _load_ref_vit()
    torch.manual_seed(seed)
    # same norm_layer as ref vit_base (eps 1e-6; torch default is 1e-5)
    m = ref.VisionTransformer(patch_size=16, embed_dim=768, depth=depth,
                              num_heads=12, mlp_ratio=4, qkv_bias=True,
                              norm_layer=functools.partial(
                                  torch.nn.LayerNorm, eps=1e-6))
    # non-degenerate random weights (default init leaves LN at identity)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.02 * torch.randn_like(p))
    if clip_variant:
        m.pos_drop = torch.nn.LayerNorm(768)
        with torch.no_grad():
            m.pos_drop.weight.add_(0.1 * torch.randn(768))
            m.pos_drop.bias.add_(0.1 * torch.randn(768))
        if quick_gelu:
            class QuickGELU(torch.nn.Module):
                def forward(self, x):
                    return x * torch.sigmoid(1.702 * x)
            for blk in m.blocks:
                blk.mlp.act = QuickGELU()
        for mod in m.modules():
            if isinstance(mod, torch.nn.LayerNorm):
                mod.eps = 1e-5
    return m.eval()


def _torch_feats(m, x_np):
    """(final-norm cls, last-block pre-norm cls) — the two DreamSim taps
    (extractor.py:161-175 and model.py:110-112)."""
    import torch
    feats = []
    h = m.blocks[-1].register_forward_hook(
        lambda mod, inp, out: feats.append(out))
    with torch.no_grad():
        last = m(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    h.remove()
    return last.numpy(), feats[0][:, 0].numpy()


def _ours_apply(state, x_np, depth, pre_norm=False, quick_gelu=False,
                ln_eps=1e-6, proj=None):
    from aqualora_tpu.models.vit import ViTB16
    from aqualora_tpu.tools.torch_import import dino_vit_from_torch
    variables = dino_vit_from_torch(state, pre_norm=pre_norm, proj=proj)
    model = ViTB16(depth=depth, pre_norm=pre_norm, quick_gelu=quick_gelu,
                   ln_eps=ln_eps, proj_dim=0 if proj is None else
                   proj.shape[1])
    return model.apply(variables, jnp.asarray(x_np))


def _np_state(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _image(seed, b=2):
    """Realistic normalized-image input (randn pixels blow up the patch
    conv and amplify f32 noise past any useful tolerance)."""
    x = np.random.RandomState(seed).rand(b, 224, 224, 3).astype(np.float32)
    return (x - 0.45) / 0.25


def test_dino_vit_parity():
    m = _make_torch_vit(depth=3)
    x = _image(0)
    last_ref, cls_ref = _torch_feats(m, x)
    out = _ours_apply(_np_state(m), x, depth=3)
    np.testing.assert_allclose(np.asarray(out["last_layer"]), last_ref,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["cls"]), cls_ref, atol=1e-4)


def test_clip_variant_parity():
    import torch
    m = _make_torch_vit(depth=3, clip_variant=True, quick_gelu=True, seed=1)
    proj = 0.05 * np.random.RandomState(1).randn(768, 512).astype(np.float32)
    x = _image(2)
    with torch.no_grad():
        emb_ref = (m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                   @ torch.from_numpy(proj)).numpy()
    out = _ours_apply(_np_state(m), x, depth=3, pre_norm=True,
                      quick_gelu=True, ln_eps=1e-5, proj=proj)
    np.testing.assert_allclose(np.asarray(out["embedding"]), emb_ref,
                               atol=1e-4)


def test_fold_qkv_lora_matches_torch_merge():
    import torch
    from aqualora_tpu.tools.torch_import import fold_qkv_lora
    m = _make_torch_vit(depth=2, seed=3)
    state = _np_state(m)
    rng = np.random.RandomState(3)
    lora = {}
    for i in range(2):
        pre = f"base_model.model.model.blocks.{i}.attn.qkv"
        lora[f"{pre}.lora_A.weight"] = rng.randn(16, 768).astype(np.float32)
        lora[f"{pre}.lora_B.weight"] = rng.randn(2304, 16).astype(np.float32)
    folded = fold_qkv_lora(state, lora, r=16, alpha=0.5)
    for i in range(2):
        pre = f"base_model.model.model.blocks.{i}.attn.qkv"
        want = state[f"blocks.{i}.attn.qkv.weight"] + (0.5 / 16) * (
            lora[f"{pre}.lora_B.weight"] @ lora[f"{pre}.lora_A.weight"])
        np.testing.assert_allclose(folded[f"blocks.{i}.attn.qkv.weight"],
                                   want, atol=1e-5)
    # fold changes the model output (sanity that it is actually applied)
    x = _image(4, b=1)
    base = _ours_apply(state, x, depth=2)
    merged = _ours_apply(folded, x, depth=2)
    assert not np.allclose(np.asarray(base["last_layer"]),
                           np.asarray(merged["last_layer"]))


def test_ensemble_distance_parity():
    """Full DreamSim ensemble distance vs a torch replica of
    PerceptualModel.embed (model.py:74-86, 244-248): concat [dino cls,
    clip emb, open_clip emb], normalize, cosine distance."""
    import torch
    from aqualora_tpu.eval.dreamsim import DreamSim
    from aqualora_tpu.tools.torch_import import dino_vit_from_torch

    depth = 2
    dino = _make_torch_vit(depth, seed=10)
    clip = _make_torch_vit(depth, clip_variant=True, quick_gelu=True,
                           seed=11)
    oclip = _make_torch_vit(depth, clip_variant=True, quick_gelu=False,
                            seed=12)
    rng = np.random.RandomState(5)
    proj_c = 0.05 * rng.randn(768, 512).astype(np.float32)
    proj_o = 0.05 * rng.randn(768, 512).astype(np.float32)

    mean_in = np.array([0.485, 0.456, 0.406], np.float32)
    std_in = np.array([0.229, 0.224, 0.225], np.float32)
    mean_cl = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std_cl = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def t_embed(x01):
        def run(m, x):
            return m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        with torch.no_grad():
            feats = []
            xd = (x01 - mean_in) / std_in
            h = dino.blocks[-1].register_forward_hook(
                lambda mod, i, o: feats.append(o[:, 0]))
            run(dino, xd)
            h.remove()
            xc = (x01 - mean_cl) / std_cl
            feats.append(run(clip, xc) @ torch.from_numpy(proj_c))
            feats.append(run(oclip, xc) @ torch.from_numpy(proj_o))
            e = torch.cat(feats, dim=-1)
            e = (e.T / torch.norm(e, dim=1)).T
            e = (e.T - torch.mean(e, dim=1)).T
            return e

    params = {
        "dino_vitb16": dino_vit_from_torch(_np_state(dino)),
        "clip_vitb16": dino_vit_from_torch(_np_state(clip), pre_norm=True,
                                           proj=proj_c),
        "open_clip_vitb16": dino_vit_from_torch(_np_state(oclip),
                                                pre_norm=True, proj=proj_o),
    }
    ds = DreamSim(params=params, vit_overrides={"depth": depth})

    a = np.random.RandomState(6).rand(2, 224, 224, 3).astype(np.float32)
    b = np.random.RandomState(7).rand(2, 224, 224, 3).astype(np.float32)
    ea, eb = t_embed(a), t_embed(b)
    dist_ref = (1 - torch.nn.functional.cosine_similarity(
        ea, eb, dim=-1)).numpy()
    dist = ds(a, b)   # 224 input: resize is identity
    np.testing.assert_allclose(dist, dist_ref, atol=1e-4)
    # embeddings themselves match too
    np.testing.assert_allclose(np.asarray(ds.embed(a)), ea.numpy(),
                               atol=1e-4)


def test_mae_as_vit_parity():
    """mae_vitb16 conversion (load_mae_as_vit.py:9-37) vs executing the
    reference mapping: pull a tiny HF ViTMAEModel state dict through the
    reference's own key/cat munging into the reference DINO ViT, run that
    torch model, and compare our mae_as_vit_from_torch + ViTB16."""
    import functools

    import torch
    from transformers import ViTMAEConfig, ViTMAEModel

    from aqualora_tpu.models.vit import ViTB16
    from aqualora_tpu.tools.torch_import import (load_mae_as_vit,
                                                 mae_as_vit_from_torch)

    torch.manual_seed(0)
    dim, depth, heads, img = 64, 2, 4, 32
    hf = ViTMAEModel(ViTMAEConfig(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=4 * dim, image_size=img, patch_size=16)).eval()
    sd = hf.state_dict()

    # the reference's mapping, executed (load_mae_as_vit.py:12-37)
    ref = _load_ref_vit()
    m = ref.VisionTransformer(img_size=[img], patch_size=16, embed_dim=dim,
                              depth=depth, num_heads=heads, mlp_ratio=4,
                              qkv_bias=True,
                              norm_layer=functools.partial(
                                  torch.nn.LayerNorm, eps=1e-6))
    with torch.no_grad():
        m.cls_token.data = sd["embeddings.cls_token"]
        m.pos_embed.data = sd["embeddings.position_embeddings"]
        m.patch_embed.proj.weight.data = \
            sd["embeddings.patch_embeddings.projection.weight"]
        m.patch_embed.proj.bias.data = \
            sd["embeddings.patch_embeddings.projection.bias"]
        for i in range(depth):
            s = f"encoder.layer.{i}"
            blk = m.blocks[i]
            blk.norm1.weight.data = sd[f"{s}.layernorm_before.weight"]
            blk.norm1.bias.data = sd[f"{s}.layernorm_before.bias"]
            blk.attn.qkv.weight.data = torch.cat(
                [sd[f"{s}.attention.attention.{p}.weight"]
                 for p in ("query", "key", "value")], dim=0)
            blk.attn.qkv.bias.data = torch.cat(
                [sd[f"{s}.attention.attention.{p}.bias"]
                 for p in ("query", "key", "value")], dim=0)
            blk.attn.proj.weight.data = \
                sd[f"{s}.attention.output.dense.weight"]
            blk.attn.proj.bias.data = sd[f"{s}.attention.output.dense.bias"]
            blk.norm2.weight.data = sd[f"{s}.layernorm_after.weight"]
            blk.norm2.bias.data = sd[f"{s}.layernorm_after.bias"]
            blk.mlp.fc1.weight.data = sd[f"{s}.intermediate.dense.weight"]
            blk.mlp.fc1.bias.data = sd[f"{s}.intermediate.dense.bias"]
            blk.mlp.fc2.weight.data = sd[f"{s}.output.dense.weight"]
            blk.mlp.fc2.bias.data = sd[f"{s}.output.dense.bias"]
        m.norm.weight.data = sd["layernorm.weight"]
        m.norm.bias.data = sd["layernorm.bias"]
    m = m.eval()

    x = np.random.RandomState(0).rand(2, img, img, 3).astype(np.float32)
    x = (x - 0.45) / 0.25
    last_ref, cls_ref = _torch_feats(m, x)

    state = {k: v.numpy() for k, v in sd.items()}
    variables = mae_as_vit_from_torch(state)
    ours = ViTB16(dim=dim, depth=depth, heads=heads, image_size=img).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours["last_layer"]), last_ref,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["cls"]), cls_ref, atol=1e-4)

    # dispatcher: b16 -> HF conversion; l16/h14 -> DINO layout passthrough
    v2 = load_mae_as_vit("mae_vitb16", state)
    chex_eq = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), variables, v2))
    assert chex_eq
    with pytest.raises(ValueError):
        load_mae_as_vit("mae_vits8", state)


def test_embed_dims_table_matches_backbones():
    """EMBED_DIMS mirrors the reference table (model.py:249-263); keep it
    consistent with the dims the constructed backbones actually produce."""
    from aqualora_tpu.eval.dreamsim import BACKBONES, EMBED_DIMS
    from aqualora_tpu.models.vit import ViTB16
    for name, dims in EMBED_DIMS.items():
        bb = {k: v for k, v in BACKBONES[name].items()
              if k not in ("mean", "std")}
        m = ViTB16(**bb)
        assert dims["cls"] == m.dim, name
        # reference quirk: clip_vitb32's table lists the POST-projection
        # width as last_layer (model.py:255) — allow either
        assert dims["last_layer"] in (m.dim, m.proj_dim), name
        if "embedding" in dims:
            assert dims["embedding"] == m.proj_dim, name


def test_mae_backbone_folds_peft_adapter(tmp_path):
    """A <name>_single_lora/ adapter dir must fold into MAE backbones the
    same way it does for every other backbone (dreamsim_from_torch)."""
    import torch
    from aqualora_tpu.tools.torch_import import (dreamsim_from_torch,
                                                 load_mae_as_vit)
    from transformers import ViTMAEConfig, ViTMAEModel

    torch.manual_seed(1)
    dim, depth, heads, img = 32, 1, 2, 32
    hf = ViTMAEModel(ViTMAEConfig(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=4 * dim, image_size=img, patch_size=16)).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    rng = np.random.RandomState(0)
    lora = {"base_model.model.model.blocks.0.attn.qkv.lora_A.weight":
            rng.randn(16, dim).astype(np.float32),
            "base_model.model.model.blocks.0.attn.qkv.lora_B.weight":
            rng.randn(3 * dim, 16).astype(np.float32)}
    plain = load_mae_as_vit("mae_vitb16", state)
    folded = load_mae_as_vit("mae_vitb16", state, lora_state=lora)
    a = plain["params"]["blocks_0"]["qkv"]["kernel"]
    b = folded["params"]["blocks_0"]["qkv"]["kernel"]
    assert not np.allclose(a, b)

    # end-to-end through the cache-dir ingest
    torch.save(hf.state_dict(), tmp_path / "mae_vitb16_pretrain.pth")
    lora_dir = tmp_path / "mae_vitb16_single_lora"
    lora_dir.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in lora.items()},
               lora_dir / "adapter_model.bin")
    params = dreamsim_from_torch(str(tmp_path), dreamsim_type="mae_vitb16")
    got = params["mae_vitb16"]["params"]["blocks_0"]["qkv"]["kernel"]
    np.testing.assert_allclose(got, b, atol=1e-6)


def test_dreamsim_accepts_mae_type():
    """eval/dreamsim.DreamSim builds and runs the mae_vitb16 single-
    backbone config (model.py:23,130,140: 'cls' tap, ImageNet stats)."""
    from aqualora_tpu.eval.dreamsim import DreamSim
    ds = DreamSim(dreamsim_type="mae_vitb16", image_size=32,
                  vit_overrides={"dim": 32, "depth": 1, "heads": 2})
    assert ds.embed_size == 32
    a = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    b = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    assert ds(a, a)[0] < 1e-5
    assert np.isfinite(ds(a, b)[0])


def test_dreamsim_from_torch_cache_dir(tmp_path):
    """End-to-end ingest of the reference checkpoint-zip layout
    (dreamsim/model.py:160-191): <name>_pretrain.pth[.tar] + <name>_lora/
    peft adapter dirs -> DreamSim params that change the distance."""
    import torch
    from aqualora_tpu.eval.dreamsim import DreamSim
    from aqualora_tpu.tools.torch_import import dreamsim_from_torch

    depth = 2
    rng = np.random.RandomState(0)

    def save_backbone(name, clip_variant, quick_gelu, seed):
        m = _make_torch_vit(depth, clip_variant=clip_variant,
                            quick_gelu=quick_gelu, seed=seed)
        sd = m.state_dict()
        if clip_variant:
            sd["proj"] = torch.from_numpy(
                0.05 * rng.randn(768, 512).astype(np.float32))
            torch.save({"state_dict": sd},
                       tmp_path / f"{name}_pretrain.pth.tar")
        else:
            torch.save(sd, tmp_path / f"{name}_pretrain.pth")
        lora_dir = tmp_path / f"{name}_lora"
        lora_dir.mkdir()
        adapter = {}
        for i in range(depth):
            pre = f"base_model.model.model.blocks.{i}.attn.qkv"
            adapter[f"{pre}.lora_A.weight"] = torch.from_numpy(
                rng.randn(16, 768).astype(np.float32))
            adapter[f"{pre}.lora_B.weight"] = torch.from_numpy(
                rng.randn(2304, 16).astype(np.float32))
        torch.save(adapter, lora_dir / "adapter_model.bin")

    save_backbone("dino_vitb16", False, False, 20)
    save_backbone("clip_vitb16", True, True, 21)
    save_backbone("open_clip_vitb16", True, False, 22)

    params = dreamsim_from_torch(str(tmp_path))
    assert set(params) == {"dino_vitb16", "clip_vitb16", "open_clip_vitb16"}
    ds = DreamSim(params=params, vit_overrides={"depth": depth})
    a, b = _image(30)[:1] * 0.1 + 0.5, _image(31)[:1] * 0.1 + 0.5
    d_same = ds(a, a)
    d_diff = ds(a, b)
    assert d_same[0] < 1e-5
    assert d_diff[0] > d_same[0]


def test_cls_tap_is_block_11_for_deep_backbones():
    """The reference hardcodes `layer = 11` for the 'cls' tap
    (model.py:111 hooks blocks[11]) — for the 24/32-deep MAE ViT-L/H
    that is an INTERMEDIATE block.  A depth-14 model's 'cls' must equal
    a depth-12 model's last-block 'cls' on shared weights."""
    import jax

    from aqualora_tpu.models.vit import ViTB16

    kw = dict(dim=32, heads=2, patch=16, image_size=32)
    deep = ViTB16(depth=14, **kw)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    params = deep.init(jax.random.PRNGKey(0), x)
    out_deep = deep.apply(params, x)

    p12 = {k: v for k, v in params["params"].items()
           if not k.startswith("blocks_") or int(k.split("_")[1]) < 12}
    out_12 = ViTB16(depth=12, **kw).apply({"params": p12}, x)
    np.testing.assert_allclose(np.asarray(out_deep["cls"]),
                               np.asarray(out_12["cls"]), atol=1e-6)
    # the taps genuinely differ from the last block at depth > 12
    assert np.abs(np.asarray(out_deep["cls"])
                  - np.asarray(out_deep["last_layer"])).max() > 1e-4
