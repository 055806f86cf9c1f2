"""Import the reference's published torch artifacts into our Flax models.

Covers the cross-ecosystem checkpoint surface (`README.md:46-51` ships
`pretrained_latentwm.pth`, `mapper.pt`, `msgdecoder.pt`):
  - msgdecoder.pt / SecretDecoder: torchvision EfficientNet-B1 state dict
    (`utils/models.py:84-96`) -> our EfficientNet layout + batch stats
  - pretrained_latentwm.pth: {'sec_encoder','sec_decoder'}
    (`train/latent_wm_pretrain.py:246-249`)
  - mapper.pt: MapperNet embedding (`utils/models.py:98-115`)
  - lpips VGG16 weights (torchvision `features.N` layout + lin heads)
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


def secret_decoder_from_torch(path_or_state, bitnum: int = 48) -> Dict:
    """msgdecoder.pt -> SecretDecoder variables {'params','batch_stats'}."""
    state = (load_torch_pickle(path_or_state)
             if isinstance(path_or_state, str) else path_or_state)
    params, stats = efficientnet_b1_from_torch(state)
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


def latentwm_from_torch(path: str) -> Dict:
    """pretrained_latentwm.pth {'sec_encoder','sec_decoder'} -> our handoff
    pytree (the stage-1 artifact, latent_wm_pretrain.py:246-249)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    enc = {k: v.numpy() for k, v in obj["sec_encoder"].items()}
    dec = {k: v.numpy() for k, v in obj["sec_decoder"].items()}
    dec_vars = secret_decoder_from_torch(dec)
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
