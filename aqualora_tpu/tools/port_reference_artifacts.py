"""One-command port of the reference's released artifacts into this
framework's layouts.

The AquaLoRA release (`README.md:46-51`) ships:
  pretrained_latentwm.pth      (stage-1: sec_encoder + sec_decoder)
  ppft_trained/pytorch_lora_weights.safetensors
  ppft_trained/mapper.pt
  ppft_trained/msgdecoder.pt

This converts them so every trainer/eval CLI here can consume them:
  <out>/pretrained_latentwm/        (orbax, --start_from_pretrain)
  <out>/pytorch_lora_weights.safetensors   (copied; same format)
  <out>/mapper.safetensors
  <out>/msgdecoder/                 (orbax, --msgdecoder_path)
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from aqualora_tpu.core import io
from aqualora_tpu.core.checkpoint import save_pytree
from aqualora_tpu.tools import torch_import


def port(out: str, latentwm: str | None = None,
         train_folder: str | None = None,
         backbone=None) -> None:
    """Port the release files into `out` (callable form of the CLI; used
    by scripts/golden_gate.py)."""
    os.makedirs(out, exist_ok=True)
    if latentwm:
        tree = torch_import.latentwm_from_torch(latentwm, cfg=backbone)
        save_pytree(os.path.join(out, "pretrained_latentwm"), tree)
        print(f"ported stage-1 artifacts -> {out}/pretrained_latentwm")

    if train_folder:
        lora_src = os.path.join(train_folder,
                                "pytorch_lora_weights.safetensors")
        expected = (lora_src, os.path.join(train_folder, "mapper.pt"),
                    os.path.join(train_folder, "msgdecoder.pt"))
        if not any(os.path.exists(p) for p in expected):
            # a typo'd --train_folder must not be an exit-0 no-op the
            # user only discovers via a confusing downstream error
            raise FileNotFoundError(
                f"found none of pytorch_lora_weights.safetensors / "
                f"mapper.pt / msgdecoder.pt in {train_folder!r} — is this "
                "the ppft_trained/ release folder?")
        if os.path.exists(lora_src):
            shutil.copy(lora_src, os.path.join(
                out, "pytorch_lora_weights.safetensors"))
            print("copied LoRA safetensors (format-compatible as-is)")
        mapper_pt = os.path.join(train_folder, "mapper.pt")
        if os.path.exists(mapper_pt):
            mp = torch_import.mapper_from_torch(mapper_pt)
            io.save_safetensors(
                {"bit_embeddings.weight": np.asarray(mp["bit_embeddings"])},
                os.path.join(out, "mapper.safetensors"))
            print("ported mapper.pt -> mapper.safetensors")
        dec_pt = os.path.join(train_folder, "msgdecoder.pt")
        if os.path.exists(dec_pt):
            # single home for the SecretDecoder variable layout
            dec = torch_import.secret_decoder_from_torch(dec_pt, cfg=backbone)
            save_pytree(os.path.join(out, "msgdecoder"), dec)
            print(f"ported msgdecoder.pt -> {out}/msgdecoder")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--latentwm", type=str, default=None,
                   help="pretrained_latentwm.pth")
    p.add_argument("--train_folder", type=str, default=None,
                   help="ppft_trained/ with lora + mapper.pt + msgdecoder.pt")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()
    port(args.out, args.latentwm, args.train_folder)


if __name__ == "__main__":
    main()
