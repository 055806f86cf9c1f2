"""LoRA key-layout converters: diffusers (trainer export) <-> A1111 webui.

Behavioral ports of `scripts/diffusers_lora_to_webui.py:5-24` and
`scripts/webui_lora_to_diffusers.py:5-27` — the regex pipelines ARE the
format specification, so the transformations must match them exactly
(including the webui->diffusers converter's deliberate dropping of
text-encoder / ff / alpha / proj keys, `webui_lora_to_diffusers.py:9-11`).
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np

from aqualora_tpu.core import io


def diffusers_to_webui(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers trainer layout -> A1111 `lora_unet_*` convention."""
    out = {}
    for key, v in state.items():
        k = re.sub(r"\.processor\.", "_", key)
        k = re.sub(r"mid_block\.", "mid_block_", k)
        k = re.sub(r"_lora\.up\.", ".lora_up.", k)
        k = re.sub(r"\.lora\.up\.", ".lora_up.", k)
        k = re.sub(r"_lora\.down\.", ".lora_down.", k)
        k = re.sub(r"\.lora\.down\.", ".lora_down.", k)
        k = re.sub(r"\.(\d+)\.", r"_\1_", k)
        k = re.sub(r"_lora_up\.", ".lora_up.", k)
        k = re.sub(r"_lora_down\.", ".lora_down.", k)
        k = re.sub(r"to_out", "to_out_0", k)
        k = re.sub(r"unet\.", "lora_unet_", k)
        k = re.sub(r"_ff\.net_", "_ff_net_", k)
        out[k] = v
    return out


def webui_to_diffusers(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """A1111 layout -> diffusers attn-processor layout.  Drops text-encoder,
    ff, alpha and proj keys like the reference."""
    out = {}
    omitted = ("_te_text_", "_ff_net_", "alpha", "_proj_")
    for key, v in state.items():
        if any(x in key for x in omitted):
            continue
        k = re.sub(r"^lora_unet_down_blocks_", "down_blocks.", key)
        k = re.sub(r"^lora_unet_up_blocks_", "up_blocks.", k)
        k = re.sub(r"^lora_unet_mid_block_", "mid_block.", k)
        k = re.sub(r"_attentions_", ".attentions.", k)
        k = re.sub(r"_transformer_blocks_", ".transformer_blocks.", k)
        k = re.sub(r"_attn(\d+)_", r".attn\1.processor.", k)
        k = re.sub(r"_to_", ".to_", k)
        k = re.sub(r"\.lora_up\.", "_lora.up.", k)
        k = re.sub(r"\.lora_down\.", "_lora.down.", k)
        k = re.sub(r"_0", "", k)
        k = re.sub(r"_alpha", ".alpha", k)
        k = re.sub(r"mid_block\.attentions\.", "mid_block.attentions.0.", k)
        out[k] = v
    return out


def main_d2w():
    p = argparse.ArgumentParser(description="diffusers LoRA -> webui layout")
    p.add_argument("--src_lora", type=str, required=True)
    p.add_argument("--tgt_lora", type=str, required=True)
    args = p.parse_args()
    io.save_safetensors(diffusers_to_webui(io.load_safetensors(args.src_lora)),
                        args.tgt_lora)
    print(f"saved {args.tgt_lora}")


def main_w2d():
    p = argparse.ArgumentParser(description="webui LoRA -> diffusers layout")
    p.add_argument("--src_lora", type=str, required=True)
    p.add_argument("--tgt_lora", type=str, required=True)
    args = p.parse_args()
    io.save_safetensors(webui_to_diffusers(io.load_safetensors(args.src_lora)),
                        args.tgt_lora)
    print(f"saved {args.tgt_lora}")


if __name__ == "__main__":
    main_d2w()
