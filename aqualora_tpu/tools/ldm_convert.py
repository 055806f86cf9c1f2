"""Original-SD (LDM) <-> diffusers checkpoint layout conversion.

TPU-native replacement for the reference's vendored kohya
`scripts/lib/model_util.py` (LDM<->diffusers key tables,
`convert_ldm_unet_checkpoint:244`, `convert_ldm_vae_checkpoint:393`, CLIP
`:560`) and the two `scripts/convert_*_stable_diffusion*.py` CLIs.  The
mapping is generated programmatically from the SD-1.5 topology instead of
hand-written 300-line tables.

All functions operate on flat numpy state dicts in torch tensor layout
(conversion to flax params goes through core/io.py afterwards).
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np

# -- UNet --------------------------------------------------------------------

_RESNET_MAP = {
    "norm1": "in_layers.0", "conv1": "in_layers.2",
    "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
    "conv2": "out_layers.3", "conv_shortcut": "skip_connection",
}

_N_DOWN = 4
_LAYERS = 2
_ATTN_DOWN = (True, True, True, False)


def unet_prefix_map() -> Dict[str, str]:
    """diffusers module prefix -> LDM (model.diffusion_model) prefix."""
    m = {
        "time_embedding.linear_1": "time_embed.0",
        "time_embedding.linear_2": "time_embed.2",
        "conv_in": "input_blocks.0.0",
        "conv_norm_out": "out.0",
        "conv_out": "out.2",
        "mid_block.attentions.0": "middle_block.1",
    }
    for j, name in ((0, "middle_block.0"), (1, "middle_block.2")):
        for dk, lk in _RESNET_MAP.items():
            m[f"mid_block.resnets.{j}.{dk}"] = f"{name}.{lk}"
    for i in range(_N_DOWN):
        for j in range(_LAYERS):
            idx = 1 + i * (_LAYERS + 1) + j
            for dk, lk in _RESNET_MAP.items():
                m[f"down_blocks.{i}.resnets.{j}.{dk}"] = \
                    f"input_blocks.{idx}.0.{lk}"
            if _ATTN_DOWN[i]:
                m[f"down_blocks.{i}.attentions.{j}"] = f"input_blocks.{idx}.1"
        if i < _N_DOWN - 1:
            m[f"down_blocks.{i}.downsamplers.0.conv"] = \
                f"input_blocks.{(i + 1) * (_LAYERS + 1)}.0.op"
    attn_up = tuple(reversed(_ATTN_DOWN))
    for i in range(_N_DOWN):
        for j in range(_LAYERS + 1):
            idx = i * (_LAYERS + 1) + j
            for dk, lk in _RESNET_MAP.items():
                m[f"up_blocks.{i}.resnets.{j}.{dk}"] = \
                    f"output_blocks.{idx}.0.{lk}"
            if attn_up[i]:
                m[f"up_blocks.{i}.attentions.{j}"] = f"output_blocks.{idx}.1"
        if i < _N_DOWN - 1:
            sub = 2 if attn_up[i] else 1
            m[f"up_blocks.{i}.upsamplers.0.conv"] = \
                f"output_blocks.{i * (_LAYERS + 1) + _LAYERS}.{sub}.conv"
    return m


def _apply_prefix_map(state: Dict[str, np.ndarray], pmap: Dict[str, str],
                      reverse: bool = False) -> Dict[str, np.ndarray]:
    """Longest-prefix rewrite of every key."""
    table = sorted(((v, k) if reverse else (k, v) for k, v in pmap.items()),
                   key=lambda kv: -len(kv[0]))
    out = {}
    for key, val in state.items():
        new = None
        for src, dst in table:
            if key == src or key.startswith(src + "."):
                new = dst + key[len(src):]
                break
        if new is None:
            raise KeyError(f"unmapped key {key}")
        out[new] = val
    return out


def unet_diffusers_to_ldm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {f"model.diffusion_model.{k}": v for k, v in
            _apply_prefix_map(state, unet_prefix_map()).items()}


def unet_ldm_to_diffusers(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    pref = "model.diffusion_model."
    inner = {k[len(pref):]: v for k, v in state.items() if k.startswith(pref)}
    return _apply_prefix_map(inner, unet_prefix_map(), reverse=True)


# -- VAE ---------------------------------------------------------------------

_VAE_RESNET_MAP = {
    "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
    "conv_shortcut": "nin_shortcut",
}
_VAE_ATTN_MAP = {
    "group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
    "to_out.0": "proj_out",
}
_VAE_BLOCKS = 4
_VAE_LAYERS = 2


def vae_prefix_map() -> Dict[str, str]:
    m = {"quant_conv": "quant_conv", "post_quant_conv": "post_quant_conv"}
    for side in ("encoder", "decoder"):
        m[f"{side}.conv_in"] = f"{side}.conv_in"
        m[f"{side}.conv_norm_out"] = f"{side}.norm_out"
        m[f"{side}.conv_out"] = f"{side}.conv_out"
        for j, name in ((0, "block_1"), (1, "block_2")):
            for dk, lk in _VAE_RESNET_MAP.items():
                m[f"{side}.mid_block.resnets.{j}.{dk}"] = \
                    f"{side}.mid.{name}.{lk}"
        for dk, lk in _VAE_ATTN_MAP.items():
            m[f"{side}.mid_block.attentions.0.{dk}"] = f"{side}.mid.attn_1.{lk}"
    for i in range(_VAE_BLOCKS):
        for j in range(_VAE_LAYERS):
            for dk, lk in _VAE_RESNET_MAP.items():
                m[f"encoder.down_blocks.{i}.resnets.{j}.{dk}"] = \
                    f"encoder.down.{i}.block.{j}.{lk}"
        if i < _VAE_BLOCKS - 1:
            m[f"encoder.down_blocks.{i}.downsamplers.0.conv"] = \
                f"encoder.down.{i}.downsample.conv"
    for i in range(_VAE_BLOCKS):   # decoder up blocks are REVERSED in LDM
        ldm_i = _VAE_BLOCKS - 1 - i
        for j in range(_VAE_LAYERS + 1):
            for dk, lk in _VAE_RESNET_MAP.items():
                m[f"decoder.up_blocks.{i}.resnets.{j}.{dk}"] = \
                    f"decoder.up.{ldm_i}.block.{j}.{lk}"
        if i < _VAE_BLOCKS - 1:
            m[f"decoder.up_blocks.{i}.upsamplers.0.conv"] = \
                f"decoder.up.{ldm_i}.upsample.conv"
    return m


def _vae_attn_reshape_to_ldm(key: str, v: np.ndarray) -> np.ndarray:
    """diffusers uses Linear for mid-attn q/k/v/proj_out; LDM uses 1x1 convs."""
    if key.endswith(".weight") and v.ndim == 2 and any(
            f".attn_1.{n}.weight" in key for n in ("q", "k", "v", "proj_out")):
        return v[:, :, None, None]
    return v


def _vae_attn_reshape_to_diffusers(key: str, v: np.ndarray) -> np.ndarray:
    if key.endswith(".weight") and v.ndim == 4 and v.shape[2:] == (1, 1) and \
            any(f"attentions.0.{n}.weight" in key
                for n in ("to_q", "to_k", "to_v", "to_out.0")):
        return v[:, :, 0, 0]
    return v


def vae_diffusers_to_ldm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = _apply_prefix_map(state, vae_prefix_map())
    return {f"first_stage_model.{k}": _vae_attn_reshape_to_ldm(k, v)
            for k, v in out.items()}


def vae_ldm_to_diffusers(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    pref = "first_stage_model."
    inner = {k[len(pref):]: v for k, v in state.items() if k.startswith(pref)}
    out = _apply_prefix_map(inner, vae_prefix_map(), reverse=True)
    return {k: _vae_attn_reshape_to_diffusers(k, v) for k, v in out.items()}


# -- CLIP text encoder (SD-1.x layout: pure prefix) ---------------------------

_CLIP_PREF = "cond_stage_model.transformer."


def clip_diffusers_to_ldm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {_CLIP_PREF + k: v for k, v in state.items()}


def clip_ldm_to_diffusers(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith(_CLIP_PREF):
            k2 = k[len(_CLIP_PREF):]
            if "position_ids" in k2:
                continue
            out[k2] = v
    return out


# -- whole checkpoints ---------------------------------------------------------

def ldm_to_diffusers(state: Dict[str, np.ndarray]
                     ) -> Tuple[Dict, Dict, Dict]:
    """full LDM state -> (unet, vae, text_encoder) diffusers-layout states."""
    return (unet_ldm_to_diffusers(state), vae_ldm_to_diffusers(state),
            clip_ldm_to_diffusers(state))


def diffusers_to_ldm(unet: Dict, vae: Dict, text_encoder: Dict
                     ) -> Dict[str, np.ndarray]:
    out = {}
    out.update(unet_diffusers_to_ldm(unet))
    out.update(vae_diffusers_to_ldm(vae))
    out.update(clip_diffusers_to_ldm(text_encoder))
    return out


def main_to_original():
    """diffusers dir -> single original-SD safetensors
    (convert_diffusers_to_original_stable_diffusion.py equivalent)."""
    import os

    from aqualora_tpu.core import io
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="diffusers checkpoint directory")
    p.add_argument("--checkpoint_path", required=True,
                   help="output .safetensors")
    args = p.parse_args()
    unet = io.load_safetensors(os.path.join(
        args.model_path, "unet/diffusion_pytorch_model.safetensors"))
    vae = io.load_safetensors(os.path.join(
        args.model_path, "vae/diffusion_pytorch_model.safetensors"))
    te = io.load_safetensors(os.path.join(
        args.model_path, "text_encoder/model.safetensors"))
    io.save_safetensors(diffusers_to_ldm(unet, vae, te),
                        args.checkpoint_path)
    print(f"saved {args.checkpoint_path}")


def main_to_diffusers():
    """original-SD single file -> diffusers-layout directory
    (convert_original_stable_diffusion_to_diffusers.py equivalent)."""
    import os

    from aqualora_tpu.core import io
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--dump_path", required=True)
    args = p.parse_args()
    state = io.load_safetensors(args.checkpoint_path)
    unet, vae, te = ldm_to_diffusers(state)
    for sub, st in (("unet", unet), ("vae", vae)):
        os.makedirs(os.path.join(args.dump_path, sub), exist_ok=True)
        io.save_safetensors(st, os.path.join(
            args.dump_path, sub, "diffusion_pytorch_model.safetensors"))
    os.makedirs(os.path.join(args.dump_path, "text_encoder"), exist_ok=True)
    io.save_safetensors(te, os.path.join(args.dump_path, "text_encoder",
                                         "model.safetensors"))
    print(f"saved diffusers layout under {args.dump_path}")


if __name__ == "__main__":
    main_to_original()
