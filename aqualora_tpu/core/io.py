"""Safetensors / torch-checkpoint interop for JAX pytrees.

The public artifact surface of the reference (SURVEY.md §1 data artifacts):
  - SD-1.5 diffusers checkpoints (unet/vae/text_encoder safetensors)
  - `pytorch_lora_weights.safetensors` in the trainer's key layout
    (`train/ppft_train.py:442-471`: attn sites as
    `unet.<mod>.processor.to_{q,k,v,out}_lora.{down,up}.weight`, conv sites
    as `unet.<mod>.lora.{down,up}.weight`, ff sites as
    `unet.<mod>.lora.{down,up}.weight`)
  - webui/A1111 `lora_unet_*` layout (scripts/diffusers_lora_to_webui.py)
  - `mapper.pt` / `msgdecoder.pt` torch pickles

Conversion torch<->flax is generic: fold `.N.` indices into `_N` names,
transpose Dense (out,in)->(in,out) and Conv (O,I,H,W)->(H,W,I,O) kernels,
rename norm weight->scale and embedding weight->embedding by tensor rank
and context.
"""

from __future__ import annotations

import json
import re
from typing import Dict, Mapping, Tuple

import numpy as np
from flax import traverse_util

# ---------------------------------------------------------------------------
# low-level safetensors (no torch dependency for numpy tensors)
# ---------------------------------------------------------------------------

def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def save_safetensors(tensors: Mapping[str, np.ndarray], path: str,
                     metadata: Dict[str, str] | None = None) -> None:
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              path, metadata=metadata)


def load_torch_pickle(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth state dict into numpy (torch is CPU-only here)."""
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # full training checkpoints (e.g. the DINO dino_vitb16_pretrain.pth
        # the reference indexes as sd['student'], extractor.py:69-77) store
        # an argparse.Namespace under 'args', which the safe unpickler
        # rejects; allowlist exactly that type rather than disabling
        # weights_only
        import argparse
        with torch.serialization.safe_globals([argparse.Namespace]):
            obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()

    def conv(v):
        if isinstance(v, dict):          # nested training checkpoints
            return {k: conv(x) for k, x in v.items()}
        return v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)

    return {k: conv(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# generic torch state-dict  <->  flax param tree
# ---------------------------------------------------------------------------

def _is_embedding(parts: Tuple[str, ...]) -> bool:
    parent = parts[-2] if len(parts) >= 2 else ""
    return "embedding" in parent and "time_embedding" not in parent


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """`down_blocks.0.attentions.1.to_q.weight` ->
    ('down_blocks_0', 'attentions_1', 'to_q', 'weight')  (leaf renamed later).
    """
    key = re.sub(r"\.(\d+)", r"_\1", key)
    return tuple(key.split("."))


# Names whose trailing _N is literal in diffusers (not a list index).
_PROTECTED = {"linear_1", "linear_2", "norm_1", "norm_2", "conv_1", "conv_2"}


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    parts = []
    for p in path:
        if p in _PROTECTED:
            parts.append(p)
        else:
            parts.append(re.sub(r"_(\d+)$", r".\1",
                                re.sub(r"_(\d+)_", r".\1_", p)))
    return ".".join(parts)


def torch_tensor_to_flax(parts: Tuple[str, ...], t: np.ndarray
                         ) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Rename the leaf and transpose for flax conventions."""
    leaf = parts[-1]
    head = parts[:-1]
    if leaf == "bias":
        return parts, t
    if leaf != "weight":
        return parts, t   # running stats etc. handled by callers
    if t.ndim == 4:       # conv OIHW -> HWIO
        return head + ("kernel",), np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2:
        if _is_embedding(parts):
            return head + ("embedding",), t
        return head + ("kernel",), np.transpose(t, (1, 0))
    if t.ndim == 1:
        # norm scales and any other 1-D 'weight' both map to 'scale'
        return head + ("scale",), t
    return parts, t


def flax_tensor_to_torch(path: Tuple[str, ...], t: np.ndarray
                         ) -> Tuple[Tuple[str, ...], np.ndarray]:
    leaf = path[-1]
    head = path[:-1]
    if leaf == "kernel":
        if t.ndim == 4:
            return head + ("weight",), np.transpose(t, (3, 2, 0, 1))
        return head + ("weight",), np.transpose(t, (1, 0))
    if leaf == "scale":
        return head + ("weight",), t
    if leaf == "embedding":
        return head + ("weight",), t
    return path, t


def torch_state_to_flax_params(state: Mapping[str, np.ndarray],
                               strip_prefix: str = "") -> Dict:
    """Generic conversion of a whole torch state dict to a flax param dict."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in state.items():
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        parts = torch_key_to_flax_path(k)
        parts, v = torch_tensor_to_flax(parts, np.asarray(v))
        flat[parts] = v
    return traverse_util.unflatten_dict(flat)


def flax_params_to_torch_state(params: Dict, prefix: str = ""
                               ) -> Dict[str, np.ndarray]:
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        path, v = flax_tensor_to_torch(path, np.asarray(v))
        out[prefix + flax_path_to_torch_key(path)] = v
    return out


def assign_into(template: Dict, loaded: Dict, path: str = "") -> Dict:
    """Replace template leaves by loaded values, validating shapes/coverage."""
    tf = traverse_util.flatten_dict(template)
    lf = traverse_util.flatten_dict(loaded)
    missing = [k for k in tf if k not in lf]
    unexpected = [k for k in lf if k not in tf]
    if missing or unexpected:
        msg = ""
        if missing:
            msg += f"missing {len(missing)} keys e.g. {missing[:3]}; "
        if unexpected:
            msg += f"unexpected {len(unexpected)} keys e.g. {unexpected[:3]}"
        raise ValueError(f"param mismatch at {path or 'root'}: {msg}")
    out = {}
    for k, v in tf.items():
        lv = np.asarray(lf[k])
        if tuple(lv.shape) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch {k}: {lv.shape} vs {np.shape(v)}")
        out[k] = lv.astype(np.asarray(v).dtype)
    return traverse_util.unflatten_dict(out)


# ---------------------------------------------------------------------------
# watermark-LoRA key layout (the trainer's export format)
# ---------------------------------------------------------------------------

def _lora_torch_key(module_key: str, which: str) -> str:
    """Reference layout (`ppft_train.py:458-468`): attn sites go through
    `.processor.to_*_lora`, conv/ff sites get a plain `.lora` suffix."""
    k = module_key
    for a in ("to_q", "to_k", "to_v"):
        k = k.replace(f".{a}", f".processor.{a}_lora")
    k = k.replace(".to_out.0", ".processor.to_out_lora")
    if ".proj_in" in k or ".proj_out" in k or ".ff." in k:
        k = k + ".lora"
    return f"unet.{k}.{which}.weight"


def unet_module_keys(config) -> list[str]:
    """Enumerate LoRA target modules in unet_keys.json order for any UNet
    config (192 entries for SD-1.5, matching `utils/unet_keys.json`)."""
    keys = []
    sites = ["proj_in", "proj_out",
             "transformer_blocks.0.attn1.to_k",
             "transformer_blocks.0.attn1.to_out.0",
             "transformer_blocks.0.attn1.to_q",
             "transformer_blocks.0.attn1.to_v",
             "transformer_blocks.0.attn2.to_k",
             "transformer_blocks.0.attn2.to_out.0",
             "transformer_blocks.0.attn2.to_q",
             "transformer_blocks.0.attn2.to_v",
             "transformer_blocks.0.ff.net.0.proj",
             "transformer_blocks.0.ff.net.2"]
    n_blocks = len(config.block_out_channels)
    for i in range(n_blocks):
        if config.attn_down_blocks[i]:
            for j in range(config.layers_per_block):
                keys += [f"down_blocks.{i}.attentions.{j}.{s}" for s in sites]
    keys += [f"mid_block.attentions.0.{s}" for s in sites]
    for i in range(n_blocks):
        if config.attn_up_blocks[i]:
            for j in range(config.layers_per_block + 1):
                keys += [f"up_blocks.{i}.attentions.{j}.{s}" for s in sites]
    return keys


def _module_key_to_flax_path(module_key: str) -> Tuple[str, ...]:
    return torch_key_to_flax_path(module_key.replace(".to_out.0", ".to_out_0"))


def export_lora_safetensors(unet_params: Dict, config, path: str | None = None
                            ) -> Dict[str, np.ndarray]:
    """Extract the LoRA collection from our U-Net params into the
    reference's `pytorch_lora_weights.safetensors` layout."""
    flat = traverse_util.flatten_dict(unet_params)
    out: Dict[str, np.ndarray] = {}
    for mk in unet_module_keys(config):
        base = _module_key_to_flax_path(mk)
        for which in ("down", "up"):
            p = base + ("lora", which, "kernel")
            if p not in flat:
                raise KeyError(f"no LoRA params at {p} (module {mk})")
            t = np.asarray(flat[p])
            if t.ndim == 4:   # HWIO -> OIHW
                t = np.transpose(t, (3, 2, 0, 1))
            else:             # (in, out) -> (out, in)
                t = np.transpose(t, (1, 0))
            out[_lora_torch_key(mk, which)] = t
    if path:
        save_safetensors(out, path)
    return out


def te_lora_torch_keys(clip_config) -> Dict[str, Tuple[str, ...]]:
    """torch key -> flax path map for the text-encoder LoRA.

    Reference layout (`train/ppft_train.py:69-91` text_encoder_lora_state_dict,
    prefixed `text_encoder.` by diffusers' save_lora_weights at `:1217-1221`):
    attn sites as `...self_attn.to_{q,k,v,out}_lora.{down,up}.weight`, mlp
    sites (the reference patches with patch_mlp=True, `:696`) as
    `...mlp.fc{1,2}.lora_linear_layer.{down,up}.weight`.
    """
    out: Dict[str, Tuple[str, ...]] = {}
    for i in range(clip_config.num_layers):
        pre = f"text_encoder.text_model.encoder.layers.{i}"
        for tname, fname in (("to_q_lora", "q_proj"), ("to_k_lora", "k_proj"),
                             ("to_v_lora", "v_proj"),
                             ("to_out_lora", "out_proj")):
            for which in ("down", "up"):
                out[f"{pre}.self_attn.{tname}.{which}.weight"] = (
                    f"layers_{i}", "self_attn", fname, "lora", which, "kernel")
        for fc in ("fc1", "fc2"):
            for which in ("down", "up"):
                out[f"{pre}.mlp.{fc}.lora_linear_layer.{which}.weight"] = (
                    f"layers_{i}", "mlp", fc, "lora", which, "kernel")
    return out


def export_te_lora_safetensors(te_params: Dict, clip_config
                               ) -> Dict[str, np.ndarray]:
    """Extract the text-encoder LoRA collection in the reference layout
    (saved into the same `pytorch_lora_weights.safetensors` as the U-Net
    LoRA, `train/ppft_train.py:1210-1221`)."""
    flat = traverse_util.flatten_dict(te_params)
    out: Dict[str, np.ndarray] = {}
    for tkey, path in te_lora_torch_keys(clip_config).items():
        if path not in flat:
            raise KeyError(f"no te-LoRA params at {path}")
        out[tkey] = np.transpose(np.asarray(flat[path]), (1, 0))
    return out


def import_te_lora_safetensors(te_params: Dict, clip_config,
                               state: Mapping[str, np.ndarray]) -> Dict:
    """Merge reference-layout text-encoder LoRA keys into our CLIP params."""
    flat = dict(traverse_util.flatten_dict(te_params))
    for tkey, path in te_lora_torch_keys(clip_config).items():
        if tkey not in state:
            raise KeyError(f"te-LoRA key {tkey} not in checkpoint")
        t = np.transpose(np.asarray(state[tkey]), (1, 0))
        if path not in flat:
            raise KeyError(f"CLIP has no LoRA at {path}; build with "
                           f"clip.with_lora()")
        if tuple(t.shape) != tuple(flat[path].shape):
            raise ValueError(f"{tkey}: shape {t.shape} vs {flat[path].shape}")
        # .dtype (not np.asarray().dtype): the old leaf may be a donated
        # (deleted) device buffer whose dtype is still readable
        flat[path] = t.astype(flat[path].dtype)
    return traverse_util.unflatten_dict(flat)


def import_lora_safetensors(unet_params: Dict, config,
                            state: Mapping[str, np.ndarray]) -> Dict:
    """Merge a reference-layout LoRA safetensors dict into our U-Net params."""
    flat = dict(traverse_util.flatten_dict(unet_params))
    n_loaded = 0
    for mk in unet_module_keys(config):
        base = _module_key_to_flax_path(mk)
        for which in ("down", "up"):
            tkey = _lora_torch_key(mk, which)
            if tkey not in state:
                raise KeyError(f"LoRA key {tkey} not in checkpoint")
            t = np.asarray(state[tkey])
            if t.ndim == 4:
                t = np.transpose(t, (2, 3, 1, 0))
            else:
                t = np.transpose(t, (1, 0))
            p = base + ("lora", which, "kernel")
            if p not in flat:
                raise KeyError(f"U-Net has no LoRA at {p}; build with "
                               f"lora enabled (rank={t.shape})")
            if tuple(t.shape) != tuple(flat[p].shape):
                raise ValueError(f"{tkey}: shape {t.shape} vs {flat[p].shape}")
            flat[p] = t.astype(np.asarray(flat[p]).dtype)
            n_loaded += 1
    assert n_loaded == 2 * len(unet_module_keys(config))
    return traverse_util.unflatten_dict(flat)
