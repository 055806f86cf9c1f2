"""Import the reference's published torch artifacts into our Flax models.

Covers the cross-ecosystem checkpoint surface (`README.md:46-51` ships
`pretrained_latentwm.pth`, `mapper.pt`, `msgdecoder.pt`):
  - msgdecoder.pt / SecretDecoder: torchvision EfficientNet-B1 state dict
    (`utils/models.py:84-96`) -> our EfficientNet layout + batch stats
  - pretrained_latentwm.pth: {'sec_encoder','sec_decoder'}
    (`train/latent_wm_pretrain.py:246-249`)
  - mapper.pt: MapperNet embedding (`utils/models.py:98-115`)
  - lpips VGG16 weights (torchvision `features.N` layout + lin heads)
  - FID InceptionV3 weights (`evaluation/pytorch_fid/inception.py:16`,
    torchvision inception_v3 key layout) -> models/inception.py
  - DreamSim ViT backbones (`evaluation/dreamsim/feature_extraction/`):
    DINO-layout state dicts incl. the CLIP/OpenCLIP-as-DINO `.pth.tar`
    conversions, with peft qkv-LoRA adapters folded into the weights
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import traverse_util as tu

from aqualora_tpu.core.config import EfficientNetConfig
from aqualora_tpu.core.io import load_torch_pickle
from aqualora_tpu.models.efficientnet import _B0_STAGES, _round_repeats


def _conv(w):        # OIHW -> HWIO
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _dw_conv(w):     # torch depthwise (C,1,H,W) -> flax HWIO with groups=C
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _lin(w):
    return np.transpose(np.asarray(w, np.float32), (1, 0))


def _bn(state, prefix):
    p = {"scale": np.asarray(state[f"{prefix}.weight"], np.float32),
         "bias": np.asarray(state[f"{prefix}.bias"], np.float32)}
    s = {"mean": np.asarray(state[f"{prefix}.running_mean"], np.float32),
         "var": np.asarray(state[f"{prefix}.running_var"], np.float32)}
    return p, s


def efficientnet_b1_from_torch(state: Dict[str, np.ndarray],
                               cfg: EfficientNetConfig | None = None,
                               prefix: str = "model."
                               ) -> Tuple[Dict, Dict]:
    """torchvision efficientnet_b1 state dict -> (params, batch_stats)
    for our EfficientNet.  `prefix` strips the SecretDecoder's `model.`."""
    cfg = cfg or EfficientNetConfig.b1()
    st = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state.items()}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def put_cba(flax_name, conv_key, bn_key, depthwise=False):
        params[flax_name + ("conv", "kernel")] = (
            _dw_conv(st[conv_key]) if depthwise else _conv(st[conv_key]))
        p, s = _bn(st, bn_key)
        for k, v in p.items():
            params[flax_name + ("bn", k)] = v
        for k, v in s.items():
            stats[flax_name + ("bn", k)] = v

    put_cba(("stem",), "features.0.0.weight", "features.0.1")
    for si, (er, ch, reps, stride, kernel) in enumerate(_B0_STAGES):
        n = _round_repeats(reps, cfg.depth_mult)
        for bi in range(n):
            t = f"features.{si + 1}.{bi}.block"
            f = (f"blocks_{si}_{bi}",)
            if er == 1:   # no expand conv: [depthwise, se, project]
                put_cba(f + ("depthwise",), f"{t}.0.0.weight", f"{t}.0.1",
                        depthwise=True)
                se, proj = f"{t}.1", f"{t}.2"
            else:         # [expand, depthwise, se, project]
                put_cba(f + ("expand",), f"{t}.0.0.weight", f"{t}.0.1")
                put_cba(f + ("depthwise",), f"{t}.1.0.weight", f"{t}.1.1",
                        depthwise=True)
                se, proj = f"{t}.2", f"{t}.3"
            for fc in ("fc1", "fc2"):
                params[f + ("se", fc, "kernel")] = _conv(st[f"{se}.{fc}.weight"])
                params[f + ("se", fc, "bias")] = np.asarray(
                    st[f"{se}.{fc}.bias"], np.float32)
            put_cba(f + ("project",), f"{proj}.0.weight", f"{proj}.1")
    put_cba(("head",), "features.8.0.weight", "features.8.1")
    params[("classifier", "kernel")] = _lin(st["classifier.1.weight"])
    params[("classifier", "bias")] = np.asarray(st["classifier.1.bias"],
                                                np.float32)
    return tu.unflatten_dict(params), tu.unflatten_dict(stats)


def secret_decoder_from_torch(path_or_state, bitnum: int = 48,
                              cfg: EfficientNetConfig | None = None) -> Dict:
    """msgdecoder.pt -> SecretDecoder variables {'params','batch_stats'}."""
    state = (load_torch_pickle(path_or_state)
             if isinstance(path_or_state, str) else path_or_state)
    params, stats = efficientnet_b1_from_torch(state, cfg)
    return {"params": {"model": params}, "batch_stats": {"model": stats}}


def secret_encoder_from_torch(path_or_state) -> Dict:
    """SecretEncoder state dict (utils/models.py:51-64):
    secret_scaler.0 = Linear(bits -> 32*32); secret_scaler.5 = zero conv."""
    st = (load_torch_pickle(path_or_state)
          if isinstance(path_or_state, str) else path_or_state)
    return {
        "secret_dense": {"kernel": _lin(st["secret_scaler.0.weight"]),
                         "bias": np.asarray(st["secret_scaler.0.bias"],
                                            np.float32)},
        "conv_out": {"kernel": _conv(st["secret_scaler.5.weight"]),
                     "bias": np.asarray(st["secret_scaler.5.bias"],
                                        np.float32)},
    }


def mapper_from_torch(path_or_state) -> Dict:
    st = (load_torch_pickle(path_or_state)
          if isinstance(path_or_state, str) else path_or_state)
    return {"bit_embeddings": np.asarray(st["bit_embeddings.weight"],
                                         np.float32)}


def latentwm_from_torch(path: str,
                        cfg: EfficientNetConfig | None = None) -> Dict:
    """pretrained_latentwm.pth {'sec_encoder','sec_decoder'} -> our handoff
    pytree (the stage-1 artifact, latent_wm_pretrain.py:246-249)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    enc = {k: v.numpy() for k, v in obj["sec_encoder"].items()}
    dec = {k: v.numpy() for k, v in obj["sec_decoder"].items()}
    dec_vars = secret_decoder_from_torch(dec, cfg=cfg)
    return {"sec_encoder": secret_encoder_from_torch(enc),
            "sec_decoder": dec_vars}


# -- LPIPS VGG16 ----------------------------------------------------------

_VGG16_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def lpips_from_torch(path_or_state) -> Dict:
    """torch `lpips` package checkpoint (net.slice*/lin*) or a dict with
    torchvision `features.N.weight` VGG16 keys + `lin{i}.model.1.weight`."""
    st = (load_torch_pickle(path_or_state)
          if isinstance(path_or_state, str) else path_or_state)
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    # vgg convs: accept either torchvision "features.N" or lpips "net.sliceK.N"
    def find(i):
        n = _VGG16_TORCH_CONV_IDX[i]
        for key in (f"features.{n}.weight", f"net.features.{n}.weight"):
            if key in st:
                return key
        # lpips slices: slice1: 0-3, slice2: 4-8, slice3: 9-15, slice4: 16-22,
        # slice5: 23-29, layer index preserved
        bounds = [(1, 0), (2, 4), (3, 9), (4, 16), (5, 23)]
        for s, start in reversed(bounds):
            if n >= start:
                return f"net.slice{s}.{n}.weight"
        raise KeyError(f"conv{i}")
    for i in range(13):
        wkey = find(i)
        params[(f"vgg", f"conv{i}", "kernel")] = _conv(st[wkey])
        params[(f"vgg", f"conv{i}", "bias")] = np.asarray(
            st[wkey.replace(".weight", ".bias")], np.float32)
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in st:
                w = np.asarray(st[key], np.float32)   # [1, C, 1, 1]
                params[(f"lin{i}",)] = w[:, :, 0, 0].T
                break
        else:
            raise KeyError(f"lin{i}")
    return tu.unflatten_dict(params)


# -- FID InceptionV3 -------------------------------------------------------

def inception_from_torch(state) -> Dict:
    """torchvision inception_v3 state dict (the layout of the FID weights,
    `evaluation/pytorch_fid/inception.py:16,196-221`) -> variables for
    models/inception.InceptionV3Features.  Module names mirror torchvision,
    so the mapping is mechanical; `fc`/`AuxLogits` heads are dropped (FID
    uses pool3 features only)."""
    if isinstance(state, str):
        state = load_torch_pickle(state)
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in state.items():
        if k.startswith(("fc.", "AuxLogits.")) or "num_batches" in k:
            continue
        parts = tuple(k.split("."))
        module, sub, leaf = parts[:-2], parts[-2], parts[-1]
        v = np.asarray(v, np.float32)
        if sub == "conv" and leaf == "weight":
            params[module + ("conv", "kernel")] = _conv(v)
        elif sub == "bn":
            if leaf == "weight":
                params[module + ("bn", "scale")] = v
            elif leaf == "bias":
                params[module + ("bn", "bias")] = v
            elif leaf == "running_mean":
                stats[module + ("bn", "mean")] = v
            elif leaf == "running_var":
                stats[module + ("bn", "var")] = v
        else:
            raise KeyError(f"unrecognized inception key {k}")
    return {"params": tu.unflatten_dict(params),
            "batch_stats": tu.unflatten_dict(stats)}


# -- DreamSim ViT backbones ------------------------------------------------

def fold_qkv_lora(state: Dict[str, np.ndarray],
                  lora_state: Dict[str, np.ndarray],
                  r: int = 16, alpha: float = 0.5) -> Dict[str, np.ndarray]:
    """Fold a peft LoRA adapter (target_modules=['qkv'], dreamsim
    config.py:28-34) into a DINO-layout state dict:
    qkv.weight += (alpha/r) * B @ A  (peft's merge rule).  Adapter keys look
    like `base_model.model.model.blocks.N.attn.qkv.lora_A.weight`."""
    out = dict(state)
    scaling = alpha / r
    for k, a in lora_state.items():
        if "lora_A" not in k:
            continue
        prefix = k[:k.index(".lora_A")]
        b = lora_state[k.replace("lora_A", "lora_B")]
        # strip peft wrapper prefixes down to `blocks.N.attn.qkv`
        target = prefix[prefix.index("blocks."):] + ".weight"
        out[target] = (np.asarray(out[target], np.float32)
                       + scaling * np.asarray(b, np.float32)
                       @ np.asarray(a, np.float32))
    return out



def _unwrap_checkpoint(state) -> dict:
    """Strip training-checkpoint nesting and DDP prefixes.  'student'
    before 'teacher': when a full DINO training checkpoint carries both,
    the reference indexes sd['student'] (extractor.py:71-77)."""
    for outer in ("state_dict", "student", "teacher", "model"):
        if outer in state and isinstance(state[outer], dict):
            state = state[outer]
    return {k.replace("module.", "").replace("backbone.", ""): v
            for k, v in state.items()}

def dino_vit_from_torch(state, pre_norm: bool = False,
                        proj: np.ndarray | None = None) -> Dict:
    """DINO-layout ViT state dict (dreamsim feature_extraction/
    vision_transformer.py:139-161; clip variants add a `pos_drop` LayerNorm,
    load_clip_as_dino.py:21) -> variables for models/vit.ViTB16."""
    if isinstance(state, str):
        state = load_torch_pickle(state)
    state = _unwrap_checkpoint(state)
    if proj is None and "proj" in state:
        proj = state["proj"]
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    p[("cls_token",)] = np.asarray(state["cls_token"], np.float32)
    p[("pos_embed",)] = np.asarray(state["pos_embed"], np.float32)
    p[("patch_embed", "kernel")] = _conv(state["patch_embed.proj.weight"])
    p[("patch_embed", "bias")] = np.asarray(state["patch_embed.proj.bias"],
                                            np.float32)
    if pre_norm:
        p[("pos_drop", "scale")] = np.asarray(state["pos_drop.weight"],
                                              np.float32)
        p[("pos_drop", "bias")] = np.asarray(state["pos_drop.bias"],
                                             np.float32)
    n_blocks = 1 + max(int(k.split(".")[1]) for k in state
                       if k.startswith("blocks."))
    for i in range(n_blocks):
        t, f = f"blocks.{i}", (f"blocks_{i}",)
        for ln in ("norm1", "norm2"):
            p[f + (ln, "scale")] = np.asarray(state[f"{t}.{ln}.weight"],
                                              np.float32)
            p[f + (ln, "bias")] = np.asarray(state[f"{t}.{ln}.bias"],
                                             np.float32)
        for ours, theirs in (("qkv", "attn.qkv"), ("proj", "attn.proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            p[f + (ours, "kernel")] = _lin(state[f"{t}.{theirs}.weight"])
            p[f + (ours, "bias")] = np.asarray(state[f"{t}.{theirs}.bias"],
                                               np.float32)
    p[("norm", "scale")] = np.asarray(state["norm.weight"], np.float32)
    p[("norm", "bias")] = np.asarray(state["norm.bias"], np.float32)
    if proj is not None:
        p[("proj",)] = np.asarray(proj, np.float32)
    return {"params": tu.unflatten_dict(p)}


def _mae_hf_to_dino_state(state) -> Dict[str, np.ndarray]:
    """HF ViTMAEModel state dict ('facebook/vit-mae-base' layout) -> a
    DINO-layout torch state dict, replicating the key mapping of
    `evaluation/dreamsim/feature_extraction/load_mae_as_vit.py:9-37`:
    separate q/k/v projections are concatenated into the DINO qkv,
    layernorm_before/after -> norm1/norm2, intermediate/output dense ->
    mlp fc1/fc2, embeddings.* -> cls_token/pos_embed/patch_embed."""
    if isinstance(state, str):
        state = load_torch_pickle(state)
    for outer in ("model", "state_dict"):
        if outer in state and isinstance(state[outer], dict):
            state = state[outer]

    def g(k):
        return np.asarray(state[k], np.float32)

    d: Dict[str, np.ndarray] = {
        "cls_token": g("embeddings.cls_token"),
        "pos_embed": g("embeddings.position_embeddings"),
        "patch_embed.proj.weight":
            g("embeddings.patch_embeddings.projection.weight"),
        "patch_embed.proj.bias":
            g("embeddings.patch_embeddings.projection.bias"),
        "norm.weight": g("layernorm.weight"),
        "norm.bias": g("layernorm.bias"),
    }
    n_blocks = 1 + max(int(k.split(".")[2]) for k in state
                       if k.startswith("encoder.layer."))
    for i in range(n_blocks):
        s, t = f"encoder.layer.{i}", f"blocks.{i}"
        d[f"{t}.norm1.weight"] = g(f"{s}.layernorm_before.weight")
        d[f"{t}.norm1.bias"] = g(f"{s}.layernorm_before.bias")
        for suffix in ("weight", "bias"):
            d[f"{t}.attn.qkv.{suffix}"] = np.concatenate(
                [g(f"{s}.attention.attention.{m}.{suffix}")
                 for m in ("query", "key", "value")], axis=0)
        d[f"{t}.attn.proj.weight"] = g(f"{s}.attention.output.dense.weight")
        d[f"{t}.attn.proj.bias"] = g(f"{s}.attention.output.dense.bias")
        d[f"{t}.norm2.weight"] = g(f"{s}.layernorm_after.weight")
        d[f"{t}.norm2.bias"] = g(f"{s}.layernorm_after.bias")
        d[f"{t}.mlp.fc1.weight"] = g(f"{s}.intermediate.dense.weight")
        d[f"{t}.mlp.fc1.bias"] = g(f"{s}.intermediate.dense.bias")
        d[f"{t}.mlp.fc2.weight"] = g(f"{s}.output.dense.weight")
        d[f"{t}.mlp.fc2.bias"] = g(f"{s}.output.dense.bias")
    return d


def mae_as_vit_from_torch(state) -> Dict:
    """HF ViTMAEModel state dict -> ViTB16 variables (see
    `_mae_hf_to_dino_state` for the key mapping)."""
    return dino_vit_from_torch(_mae_hf_to_dino_state(state))


def load_mae_as_vit(model_type: str, path_or_state,
                    lora_state: Dict[str, np.ndarray] | None = None,
                    lora_scaling: Tuple[int, float] = (16, 0.5)) -> Dict:
    """`load_mae_as_vit.py:8-54` dispatcher: mae_vitb16 checkpoints ship in
    the HF ViTMAEModel layout and need the q/k/v concat conversion;
    mae_vitl16/mae_vith14 release checkpoints are already in DINO layout
    under a 'model' key.  `lora_state`: optional peft qkv adapter folded
    into the DINO-layout weights (same rule as the other backbones)."""
    if model_type == "mae_vitb16":
        state = _mae_hf_to_dino_state(path_or_state)
    elif model_type in ("mae_vitl16", "mae_vith14"):
        state = path_or_state
        if isinstance(state, str):
            state = load_torch_pickle(state)
        for outer in ("model", "state_dict"):
            if outer in state and isinstance(state[outer], dict):
                state = state[outer]
    else:
        raise ValueError(f"model {model_type} not supported")
    if lora_state is not None:
        state = fold_qkv_lora(dict(state), lora_state,
                              r=lora_scaling[0], alpha=lora_scaling[1])
    return dino_vit_from_torch(state)


def _load_peft_adapter(lora_dir: str):
    """-> (state, r, alpha).  Hyperparameters come from the adapter's own
    adapter_config.json when present (peft writes it next to the
    weights); the dreamsim release values (r=16, lora_alpha=0.5,
    config.py:28-34) are only the fallback — hardcoding them would
    silently mis-scale any adapter trained with different settings."""
    import json
    import os
    r, alpha = 16, 0.5
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        r = int(c.get("r", r))
        alpha = float(c.get("lora_alpha", alpha))
    st_path = os.path.join(lora_dir, "adapter_model.safetensors")
    if os.path.exists(st_path):
        from aqualora_tpu.core.io import load_safetensors
        return load_safetensors(st_path), r, alpha
    return load_torch_pickle(
        os.path.join(lora_dir, "adapter_model.bin")), r, alpha


def dreamsim_from_torch(cache_dir: str,
                        dreamsim_type: str = "ensemble") -> Dict:
    """Ingest the reference DreamSim checkpoint directory (the unzipped
    weights of dreamsim/model.py:160-191: `<name>_pretrain.pth[.tar]` +
    `<name>_[single_]lora/` peft adapters) -> {backbone_name: variables}
    for eval/dreamsim.DreamSim."""
    import os

    from aqualora_tpu.eval.dreamsim import MODEL_CONFIGS
    tag = "" if dreamsim_type == "ensemble" else "single_"
    out: Dict[str, Dict] = {}
    for name, _ in MODEL_CONFIGS[dreamsim_type]:
        if name.startswith("mae_"):
            # load_mae_as_vit.py: b16 in HF ViTMAEModel layout, l16/h14 in
            # DINO layout under 'model'; saved as <name>_pretrain.pth.
            # A peft adapter dir folds in like every other backbone.
            lora_dir = os.path.join(cache_dir, f"{name}_{tag}lora")
            lora = (_load_peft_adapter(lora_dir)
                    if os.path.isdir(lora_dir) else None)
            out[name] = load_mae_as_vit(
                name, os.path.join(cache_dir, f"{name}_pretrain.pth"),
                lora_state=lora[0] if lora else None,
                lora_scaling=lora[1:] if lora else (16, 0.5))
            continue
        pre_norm = name != "dino_vitb16"
        fname = (f"{name}_pretrain.pth.tar" if pre_norm
                 else "dino_vitb16_pretrain.pth")
        state = _unwrap_checkpoint(
            load_torch_pickle(os.path.join(cache_dir, fname)))
        proj = state.pop("proj", None)
        lora_dir = os.path.join(cache_dir, f"{name}_{tag}lora")
        if os.path.isdir(lora_dir):
            adapter, r, alpha = _load_peft_adapter(lora_dir)
            state = fold_qkv_lora(state, adapter, r=r, alpha=alpha)
        out[name] = dino_vit_from_torch(state, pre_norm=pre_norm, proj=proj)
    return out
