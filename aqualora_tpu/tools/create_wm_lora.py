"""Fold a chosen bit-string into the trained watermark LoRA, producing a
standard (diffusers-compatible) LoRA that carries the message in its
weights.

Semantics of `scripts/create_wm_lora.py:9-51`:
  attn/ff sites:      down' = diag(mapper(msg)) @ down * scale
  proj_in/out convs:  down' = down * mapper(msg)[:, None, None, None] * scale
  up weights unchanged; text-encoder keys dropped; scale default 1.03.

Operates directly on the torch-layout safetensors dict (the public
artifact format), so it works on both our exports and reference-trained
checkpoints.  Also importable with save=False (used by the demo).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import numpy as np

from aqualora_tpu.core import io


def mapper_diag_from_state(mapper_state: Dict[str, np.ndarray],
                           msg_bits: np.ndarray) -> np.ndarray:
    """MapperNet forward in numpy: (msg @ E)/sqrt(N) + 1
    (utils/models.py:110-115).  msg_bits: one [N_bits] message or a
    batch [B, N_bits]; returns [B, rank] (B=1 for one message) — the one
    home for the mapper math shared by the fold path and the per-image
    serving path (eval/utils_eval.simple_sample messages=...)."""
    emb = np.asarray(mapper_state["bit_embeddings.weight"], np.float32)
    msg = np.asarray(msg_bits, np.float32).reshape(-1, emb.shape[0])
    return (msg @ emb) / np.sqrt(emb.shape[0]) + 1.0       # [B, rank]


def load_mapper_state(train_folder: str) -> Dict[str, np.ndarray]:
    """mapper.safetensors (our export) or mapper.pt (reference torch)."""
    st = os.path.join(train_folder, "mapper.safetensors")
    if os.path.exists(st):
        return io.load_safetensors(st)
    return io.load_torch_pickle(os.path.join(train_folder, "mapper.pt"))


def create_watermark_lora(train_folder: str, scale: float = 1.03,
                          msg_bits: int = 48,
                          hidinfo: Optional[str] = None, save: bool = True,
                          rng: Optional[np.random.Generator] = None
                          ) -> Tuple[str, Dict[str, np.ndarray]]:
    """-> (bitstring, folded state dict); saves to
    <train_folder>/<bitstring>/pytorch_lora_weights.safetensors when save."""
    lora = io.load_safetensors(
        os.path.join(train_folder, "pytorch_lora_weights.safetensors"))
    if hidinfo is None:
        rng = rng or np.random.default_rng()
        bits = rng.integers(0, 2, msg_bits)
    else:
        # real raises (assert is stripped under python -O): a wrong
        # length or non-binary characters would otherwise fold a secret
        # that can never be decoded back
        if len(hidinfo) != msg_bits:
            raise ValueError(f"hidinfo has {len(hidinfo)} chars, mapper "
                             f"expects {msg_bits} bits")
        if not set(hidinfo) <= {"0", "1"}:
            raise ValueError(f"hidinfo must be a 0/1 bitstring, got "
                             f"{hidinfo!r}")
        bits = np.array([int(c) for c in hidinfo])
    mapper_state = load_mapper_state(train_folder)
    mapper_bits = int(np.asarray(
        mapper_state["bit_embeddings.weight"]).shape[0])
    if mapper_bits != msg_bits:
        # mapper_diag_from_state reshapes to (-1, mapper_bits): a
        # msg_bits that is a MULTIPLE of the trained width would silently
        # fold only the first row while returning the full-length
        # bitstring (the reference's load_state_dict crashes here too)
        raise ValueError(f"msg_bits {msg_bits} != the trained mapper's "
                         f"{mapper_bits} bits ({train_folder})")
    mapped = mapper_diag_from_state(mapper_state, bits)[0]

    out: Dict[str, np.ndarray] = {}
    for key, w in lora.items():
        if "text_encoder" in key:
            continue                              # dropped (`:38-39`)
        if "unet" not in key:
            raise ValueError(f"key {key} not recognized")
        w = np.asarray(w, np.float32)
        # exclusive branches keyed on the tensor role: "attn" also
        # substring-matches "attentions" in proj_in/proj_out keys, so
        # overlapping if-blocks would compute a misbroadcast 4-D array
        # first and rely on the later block overwriting it
        if "up.weight" in key:
            out[key] = w
        elif "down.weight" in key:
            if "proj_in" in key or "proj_out" in key:
                out[key] = w * mapped[:, None, None, None] * scale  # conv
            else:
                out[key] = mapped[:, None] * w * scale     # linear [rank,in]

    bitstring = "".join(map(str, bits.tolist()))
    if save:
        d = os.path.join(train_folder, bitstring)
        os.makedirs(d, exist_ok=True)
        io.save_safetensors(out, os.path.join(d,
                                              "pytorch_lora_weights.safetensors"))
    return bitstring, out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_folder", type=str, required=True)
    p.add_argument("--msg_bits", type=int, default=48)
    p.add_argument("--scale", type=float, default=1.03)
    p.add_argument("--hidinfo", type=str, default=None,
                   help="secret bitstring; random if omitted")
    args = p.parse_args()
    bitstring, _ = create_watermark_lora(args.train_folder, args.scale,
                                         args.msg_bits, args.hidinfo)
    print(bitstring)


if __name__ == "__main__":
    main()
