"""Bake webui-format LoRA(s) into a full Stable Diffusion checkpoint.

Equivalent of `scripts/merge_lora.py` (kohya-derived): for every LoRA
module, `W += ratio * (up @ down) * alpha/dim` with the linear / conv-1x1 /
conv-3x3 cases (`merge_lora.py:80-127`), reading/writing original-SD (LDM)
single-file checkpoints (`:147-179`) with SAI modelspec metadata
(`scripts/lib/sai_model_spec.py`).  Also accepts diffusers-layout
directories on input.

The webui-name -> module resolution is built by enumerating the known
SD-1.5 LoRA sites and text-encoder modules instead of kohya's runtime
module scan (`merge_lora.py:56-78`).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Tuple

import numpy as np

from aqualora_tpu.core import io
from aqualora_tpu.core.config import UNetConfig
from aqualora_tpu.core.io import _lora_torch_key, unet_module_keys
from aqualora_tpu.tools import ldm_convert, sai_model_spec
from aqualora_tpu.tools.lora_layouts import diffusers_to_webui


def webui_name_to_module() -> Dict[str, Tuple[str, str]]:
    """webui module name -> ('unet'|'te', diffusers module path)."""
    table: Dict[str, Tuple[str, str]] = {}
    for mk in unet_module_keys(UNetConfig.sd15()):
        tkey = _lora_torch_key(mk, "down")
        webui = next(iter(diffusers_to_webui({tkey: None})))
        table[webui.replace(".lora_down.weight", "")] = ("unet", mk)
    # text encoder: q/k/v/out + mlp fc1/fc2 for up to 23 layers (SD-1.x
    # has 12, SD-2.x open-CLIP-ported has 23; layers absent from the
    # loaded model are skipped at merge time)
    for layer in range(23):
        base = f"text_model.encoder.layers.{layer}"
        for mod in ("self_attn.q_proj", "self_attn.k_proj",
                    "self_attn.v_proj", "self_attn.out_proj",
                    "mlp.fc1", "mlp.fc2"):
            webui = "lora_te_" + f"{base}.{mod}".replace(".", "_")
            table[webui] = ("te", f"{base}.{mod}")
    return table


def merge_lora_into_states(unet_state: Dict[str, np.ndarray],
                           te_state: Dict[str, np.ndarray],
                           lora_state: Dict[str, np.ndarray],
                           ratio: float = 1.0) -> None:
    """In-place W += ratio * up@down * alpha/dim (merge_lora.py:80-127)."""
    table = webui_name_to_module()
    modules = sorted({k.rsplit(".", 2)[0] for k in lora_state
                      if ".lora_down." in k})
    for name in modules:
        down = np.asarray(lora_state[f"{name}.lora_down.weight"], np.float32)
        up = np.asarray(lora_state[f"{name}.lora_up.weight"], np.float32)
        dim = down.shape[0]
        alpha = float(np.asarray(lora_state.get(f"{name}.alpha", dim)))
        scale = alpha / dim
        if name not in table:
            # reference parity (merge_lora.py:93-95): kohya LoRAs can
            # carry modules outside the watermark's 192+TE sites (resnet
            # conv3x3, conv_in, ...) — skip with a message, don't abort a
            # half-applied merge
            print(f"no module found for LoRA weight: {name}")
            continue
        which, module = table[name]
        state = unet_state if which == "unet" else te_state
        wkey = f"{module}.weight"
        if wkey not in state:
            # e.g. an SD2 text-encoder LoRA layer >= 12 merged into an
            # SD-1.x base: the site exists in the table but not the model
            print(f"no module found for LoRA weight: {name}")
            continue
        w = np.asarray(state[wkey], np.float32)
        if down.ndim == 2:                       # linear
            delta = up @ down
        elif down.shape[2:] == (1, 1):           # 1x1 conv
            delta = (up[:, :, 0, 0] @ down[:, :, 0, 0])[:, :, None, None]
        else:                                    # 3x3 conv (conv down, 1x1 up)
            delta = np.einsum("or,rikl->oikl", up[:, :, 0, 0], down)
        # layout mismatch between the LoRA file and the base (reference
        # merge_lora.py:108-111 "W is linear while LoRA is conv" and
        # vice versa): a conv-1x1 LoRA merges into a Linear projection
        # (SD2 use_linear_projection bases) by squeezing, and a linear
        # LoRA into a 1x1-conv weight by expanding — NOT by numpy
        # broadcasting, which would silently build an [O,I,O,I] tensor
        if w.ndim == 2 and delta.ndim == 4:
            if delta.shape[2:] != (1, 1):
                raise ValueError(
                    f"{name}: 3x3-conv LoRA cannot merge into the linear "
                    f"weight {wkey} {w.shape}")
            delta = delta[:, :, 0, 0]
        elif w.ndim == 4 and delta.ndim == 2:
            delta = delta[:, :, None, None]
        state[wkey] = (w + ratio * scale * delta).astype(state[wkey].dtype)


def build_sai_metadata(args, tensors: Dict[str, np.ndarray] | None = None
                       ) -> Dict[str, str]:
    """Full SAI modelspec metadata, mirroring the reference merge CLI's
    call (scripts/merge_lora.py:153-169): merged_from = base + LoRA titles,
    title = output filename stem, is_stable_diffusion_ckpt=True.  Also
    records the content hash (which the reference leaves TODO)."""
    merged_from = sai_model_spec.build_merged_from(
        [args.sd_model] + list(args.models))
    title = os.path.splitext(os.path.basename(args.save_to))[0]
    meta = sai_model_spec.build_metadata(
        None, args.v2, args.v2, False, False, False, time.time(),
        title=title, merged_from=merged_from, is_stable_diffusion_ckpt=True)
    if tensors is not None:
        meta["modelspec.hash_sha256"] = (
            sai_model_spec.precalculate_safetensors_hashes(tensors))
    return meta


def load_sd_states(path: str):
    """single-file LDM safetensors or diffusers dir -> (unet, vae, te)."""
    if os.path.isdir(path):
        unet = io.load_safetensors(os.path.join(
            path, "unet/diffusion_pytorch_model.safetensors"))
        vae = io.load_safetensors(os.path.join(
            path, "vae/diffusion_pytorch_model.safetensors"))
        te = io.load_safetensors(os.path.join(
            path, "text_encoder/model.safetensors"))
        te = {k[len("text_model."):] if k.startswith("text_model.") else k: v
              for k, v in te.items()}
        te = {f"text_model.{k}": v for k, v in te.items()}
        return unet, vae, te
    state = io.load_safetensors(path)
    return ldm_convert.ldm_to_diffusers(state)


def merge(args) -> None:
    unet, vae, te = load_sd_states(args.sd_model)
    ratios = args.ratios or [1.0] * len(args.models)
    if len(ratios) != len(args.models):
        # the reference asserts the same (merge_lora.py:131); a short
        # --ratios list would otherwise silently drop trailing LoRAs
        raise SystemExit(f"--ratios has {len(ratios)} entries for "
                         f"{len(args.models)} --models; counts must match")
    for lora_path, ratio in zip(args.models, ratios):
        lora = io.load_safetensors(lora_path)
        merge_lora_into_states(unet, te, lora, ratio)
        print(f"merged {lora_path} at ratio {ratio}")
    # forward --v2 so the saved single file uses the SD2 layout (re-fused
    # open-CLIP qkv under cond_stage_model.model., Linear proj_in/out) —
    # the reference likewise saves with v2 (merge_lora.py:178)
    out = ldm_convert.diffusers_to_ldm(unet, vae, te, v2=args.v2)
    if args.precision == "fp16":
        out = {k: v.astype(np.float16) for k, v in out.items()}
    if args.v2 and not args.no_metadata:
        # reference merge_lora.py:171-175: v2 metadata assumes the
        # 768-v (v-prediction) architecture because a merged state dict
        # cannot reveal the prediction type — warn like the reference
        print("Cannot determine if the model is for v-prediction; "
              "saving modelspec metadata as v-prediction (768-v)")
    meta = None if args.no_metadata else build_sai_metadata(args, out)
    io.save_safetensors(out, args.save_to, metadata=meta)
    print(f"saved {args.save_to}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (merge_lora.py:222-226 CLI)
    p.add_argument("--sd_model", type=str, required=True,
                   help="base SD checkpoint (single file or diffusers dir)")
    p.add_argument("--save_to", type=str, required=True)
    p.add_argument("--models", type=str, nargs="+", required=True,
                   help="webui-format LoRA safetensors to merge")
    p.add_argument("--ratios", type=float, nargs="+", default=None)
    p.add_argument("--precision", type=str, default="fp32",
                   choices=["fp32", "fp16"])
    p.add_argument("--v2", action="store_true",
                   help="SD2 base model: save in the v2 single-file "
                        "layout (open-CLIP text tower, Linear proj_in/"
                        "out) and stamp v2 modelspec fields")
    p.add_argument("--no_metadata", action="store_true")
    merge(p.parse_args())


if __name__ == "__main__":
    main()
