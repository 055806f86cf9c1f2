"""Fabricate random-weight artifacts in the reference's EXACT file formats.

Used by the golden parity gate (scripts/golden_gate.py) and its CI test so
the full port -> fold -> generate -> decode protocol can be exercised
before the published checkpoints are available.  Formats synthesized:

  pretrained_latentwm.pth   torch pickle {'sec_encoder','sec_decoder'}
                            (train/latent_wm_pretrain.py:246-249)
  mapper.pt                 torch pickle MapperNet state
                            (utils/models.py:103; ppft_train.py:1225)
  msgdecoder.pt             torch pickle, torchvision EfficientNet-B1
                            layout under 'model.' (utils/models.py:84-96)
  pytorch_lora_weights.safetensors   diffusers LoRA layout over the 192
                            U-Net targets (ppft_train.py:443-471,1210-1229)
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from aqualora_tpu.core import io
from aqualora_tpu.core.config import EfficientNetConfig, UNetConfig


def _block_channels(config: UNetConfig, module_key: str) -> int:
    ch = config.block_out_channels
    part = module_key.split(".")
    if part[0] == "down_blocks":
        return ch[int(part[1])]
    if part[0] == "up_blocks":
        return tuple(reversed(ch))[int(part[1])]
    return ch[-1]                                  # mid_block


def lora_site_dims(config: UNetConfig, module_key: str):
    """(in_features, out_features, is_conv) for one unet_keys.json site."""
    c = _block_channels(config, module_key)
    if module_key.endswith(("proj_in", "proj_out")):
        return c, c, True
    if ".attn2.to_k" in module_key or ".attn2.to_v" in module_key:
        return config.cross_attention_dim, c, False
    if "ff.net.0.proj" in module_key:
        return c, 8 * c, False                     # GEGLU: 2 * (4c)
    if "ff.net.2" in module_key:
        return 4 * c, c, False
    return c, c, False                             # attn q/k/v/out


def synth_lora_state(config: UNetConfig, rank: int,
                     rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random LoRA safetensors dict in the reference torch layout
    (down ~ N(0, 1/rank); up small random — deliberately NOT the
    diffusers zero-init, which would make the folded LoRA a no-op and
    the golden gate's fold->generate->decode protocol vacuous)."""
    out: Dict[str, np.ndarray] = {}
    for mk in io.unet_module_keys(config):
        cin, cout, is_conv = lora_site_dims(config, mk)
        down = rng.standard_normal((rank, cin)).astype(np.float32) / rank
        up = (rng.standard_normal((cout, rank)).astype(np.float32) * 0.01)
        if is_conv:
            down = down[:, :, None, None]
            up = up[:, :, None, None]
        out[io._lora_torch_key(mk, "down")] = down
        out[io._lora_torch_key(mk, "up")] = up
    return out


def _synth_torch_b1_state(cfg: EfficientNetConfig, bits: int, torch,
                          gen) -> Dict:
    """torchvision efficientnet_b1 state dict shapes via inversion of our
    Flax module shapes (the same mapping tools/torch_import traverses)."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util as tu

    from aqualora_tpu.models.efficientnet import EfficientNet

    model = EfficientNet(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), False))
    flat_p = tu.flatten_dict(shapes["params"])
    flat_s = tu.flatten_dict(shapes["batch_stats"])

    from aqualora_tpu.models.efficientnet import _B0_STAGES, _round_repeats

    st: Dict = {}

    def rnd(shape):
        return torch.randn(*shape, generator=gen) * 0.05

    def put(torch_conv, torch_bn, fpath):
        k = flat_p[fpath + ("conv", "kernel")]
        st[torch_conv] = rnd((k.shape[3], k.shape[2], k.shape[0], k.shape[1]))
        n = flat_p[fpath + ("bn", "scale")].shape
        st[f"{torch_bn}.weight"] = 1 + rnd(n)
        st[f"{torch_bn}.bias"] = rnd(n)
        st[f"{torch_bn}.running_mean"] = rnd(n)
        st[f"{torch_bn}.running_var"] = 1 + 0.1 * rnd(n).abs()

    put("features.0.0.weight", "features.0.1", ("stem",))
    for si, (er, _, reps, _, _) in enumerate(_B0_STAGES):
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
                k = flat_p[f + ("se", fc, "kernel")]
                st[f"{se}.{fc}.weight"] = rnd((k.shape[3], k.shape[2], 1, 1))
                st[f"{se}.{fc}.bias"] = rnd(
                    flat_p[f + ("se", fc, "bias")].shape)
            put(f"{proj}.0.weight", f"{proj}.1", f + ("project",))
    put("features.8.0.weight", "features.8.1", ("head",))
    head = flat_p[("head", "conv", "kernel")].shape[3]
    st["classifier.1.weight"] = rnd((bits * 2, head))
    st["classifier.1.bias"] = rnd((bits * 2,))
    del flat_s
    return st


def perturb_zero_init(tree: Dict, seed: int = 0, std: float = 0.02) -> Dict:
    """Replace the zero-init leaves that make a fresh PPFT step degenerate.

    With diffusers-convention zero-init LoRA `up` kernels (models/lora.py)
    and the zero-init SecretEncoder output conv (utils/models.py:63
    `zero_module`), `wm_input == model_input` and student == teacher, so the
    very first PPFT loss — and every gradient in the ICI all-reduce — is
    exactly 0.  That is correct training behavior, but useless as a
    multi-chip numerics gate.  This helper adds small Gaussian noise to
    exactly those leaves (LoRA `up` kernels anywhere in the tree, and a
    SecretEncoder `conv_out` kernel) so one step produces a strictly
    positive loss and non-zero gradients.  Used by
    `__graft_entry__.dryrun_multichip` and the DP/TP equivalence tests.
    """
    from flax import traverse_util as tu

    rng = np.random.default_rng(seed)
    flat = dict(tu.flatten_dict(tree))
    hit = 0
    for path, v in flat.items():
        if (path[-3:] == ("lora", "up", "kernel")
                or path[-2:] == ("conv_out", "kernel")):
            v = np.asarray(v)
            flat[path] = v + (rng.standard_normal(v.shape) * std
                              ).astype(v.dtype)
            hit += 1
    if hit == 0:
        raise ValueError("no zero-init LoRA-up / conv_out leaves found")
    return tu.unflatten_dict(flat)


def synthesize_reference_artifacts(out_dir: str, msg_bits: int = 48,
                                   rank: int = 320,
                                   unet: UNetConfig | None = None,
                                   backbone: EfficientNetConfig | None = None,
                                   seed: int = 0) -> None:
    """Write the four reference release files under `out_dir` (with the
    LoRA triple inside `out_dir/ppft_trained/`, mirroring README.md:46-51)."""
    import torch

    unet = unet or UNetConfig.sd15()
    backbone = backbone or EfficientNetConfig.b1(num_classes=msg_bits * 2)
    gen = torch.Generator().manual_seed(seed)
    rng = np.random.default_rng(seed)
    train_dir = os.path.join(out_dir, "ppft_trained")
    os.makedirs(train_dir, exist_ok=True)

    # stage-1 handoff: SecretEncoder (utils/models.py:57-64 layout) +
    # SecretDecoder ('model.'-prefixed B1)
    enc = {
        "secret_scaler.0.weight": torch.randn(32 * 32, msg_bits,
                                              generator=gen) * 0.02,
        "secret_scaler.0.bias": torch.randn(32 * 32, generator=gen) * 0.02,
        "secret_scaler.5.weight": torch.randn(4, 4, 3, 3,
                                              generator=gen) * 0.01,
        "secret_scaler.5.bias": torch.randn(4, generator=gen) * 0.01,
    }
    b1 = _synth_torch_b1_state(backbone, msg_bits, torch, gen)
    dec = {f"model.{k}": v for k, v in b1.items()}
    torch.save({"sec_encoder": enc, "sec_decoder": dec},
               os.path.join(out_dir, "pretrained_latentwm.pth"))

    torch.save({"bit_embeddings.weight":
                torch.randn(msg_bits, rank, generator=gen)
                / np.sqrt(rank)},
               os.path.join(train_dir, "mapper.pt"))
    torch.save(dec, os.path.join(train_dir, "msgdecoder.pt"))

    io.save_safetensors(synth_lora_state(unet, rank, rng),
                        os.path.join(train_dir,
                                     "pytorch_lora_weights.safetensors"))
