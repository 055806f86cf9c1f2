"""DreamSim perceptual distance (replaces vendored `evaluation/dreamsim/`).

Reference-fidelity rebuild of `dreamsim/model.py:14-158` with the dims and
model lists of `dreamsim/config.py:1-43`:

  - 'ensemble' (the default used by `run_dreamsim.py`): DINO ViT-B/16
    ('cls' tap, 768-d), CLIP ViT-B/16 and OpenCLIP ViT-B/16 (both converted
    to DINO layout, 'embedding' tap, 512-d each) -> 1792-d concat;
    peft-LoRA (r=16, alpha=0.5 on qkv) is folded into the imported weights;
    the MLP head is Identity in LoRA mode (model.py:57-58).
  - single-backbone types ('dino_vitb16', 'clip_vitb32', 'open_clip_vitb32')
    mirror config.py:9-26.

Per-backbone preprocessing matches `model.py:120-141` (ImageNet stats for
DINO, CLIP stats for both CLIP variants).  Embeddings are normalized as in
`model.py:244-248` (unit-normalize, then subtract the per-vector mean) and
compared by cosine distance (`model.py:64-72`).

Weights: `tools/torch_import.dreamsim_from_torch(cache_dir)` ingests the
reference checkpoint zip contents; random init still runs the full
pipeline for plumbing tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.models.vit import DreamSimMLP, ViTB16

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# Backbone hyperparameters (load_clip_as_dino.py:21-32, model.py:123-141;
# MAE variants via load_mae_as_vit.py:8-54 — plain DINO topology at
# base/large/huge dims, ImageNet preprocessing like DINO, model.py:130,140).
BACKBONES: Dict[str, Dict] = {
    "dino_vitb16": dict(patch=16, pre_norm=False, quick_gelu=False,
                        ln_eps=1e-6, proj_dim=0,
                        mean=_IMAGENET_MEAN, std=_IMAGENET_STD),
    "clip_vitb16": dict(patch=16, pre_norm=True, quick_gelu=True,
                        ln_eps=1e-5, proj_dim=512,
                        mean=_CLIP_MEAN, std=_CLIP_STD),
    "open_clip_vitb16": dict(patch=16, pre_norm=True, quick_gelu=False,
                             ln_eps=1e-5, proj_dim=512,
                             mean=_CLIP_MEAN, std=_CLIP_STD),
    "clip_vitb32": dict(patch=32, pre_norm=True, quick_gelu=True,
                        ln_eps=1e-5, proj_dim=512,
                        mean=_CLIP_MEAN, std=_CLIP_STD),
    "open_clip_vitb32": dict(patch=32, pre_norm=True, quick_gelu=False,
                             ln_eps=1e-5, proj_dim=512,
                             mean=_CLIP_MEAN, std=_CLIP_STD),
    "mae_vitb16": dict(patch=16, pre_norm=False, quick_gelu=False,
                       ln_eps=1e-6, proj_dim=0,
                       mean=_IMAGENET_MEAN, std=_IMAGENET_STD),
    "mae_vitl16": dict(patch=16, dim=1024, depth=24, heads=16,
                       pre_norm=False, quick_gelu=False, ln_eps=1e-6,
                       proj_dim=0, mean=_IMAGENET_MEAN, std=_IMAGENET_STD),
    "mae_vith14": dict(patch=14, dim=1280, depth=32, heads=16,
                       pre_norm=False, quick_gelu=False, ln_eps=1e-6,
                       proj_dim=0, mean=_IMAGENET_MEAN, std=_IMAGENET_STD),
}

# (backbone, feature tap) per dreamsim_type (config.py:2-27; the MAE types
# are accepted by PerceptualModel directly, model.py:23, with 'cls' /
# 'last_layer' taps only — 'embedding' is rejected for dino/mae at
# model.py:91).  'cls' in our ViT is the pre-final-norm cls token
# (extractor hook semantics).
MODEL_CONFIGS: Dict[str, list] = {
    "ensemble": [("dino_vitb16", "cls"), ("clip_vitb16", "embedding"),
                 ("open_clip_vitb16", "embedding")],
    "dino_vitb16": [("dino_vitb16", "cls")],
    "clip_vitb32": [("clip_vitb32", "embedding")],
    "open_clip_vitb32": [("open_clip_vitb32", "embedding")],
    "mae_vitb16": [("mae_vitb16", "cls")],
    "mae_vitl16": [("mae_vitl16", "cls")],
    "mae_vith14": [("mae_vith14", "cls")],
}

# model.py:249-263 (subset covering the backbones built here)
EMBED_DIMS: Dict[str, Dict[str, int]] = {
    "dino_vitb16": {"cls": 768, "last_layer": 768},
    "clip_vitb16": {"cls": 768, "embedding": 512, "last_layer": 768},
    "clip_vitb32": {"cls": 768, "embedding": 512, "last_layer": 512},
    "mae_vitb16": {"cls": 768, "last_layer": 768},
    "mae_vitl16": {"cls": 1024, "last_layer": 1024},
    "mae_vith14": {"cls": 1280, "last_layer": 1280},
    "open_clip_vitb16": {"cls": 768, "embedding": 512, "last_layer": 768},
    "open_clip_vitb32": {"cls": 768, "embedding": 512, "last_layer": 768},
}


def normalize_embedding(e: jnp.ndarray) -> jnp.ndarray:
    """model.py:244-248: unit-normalize rows, subtract per-row mean."""
    e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e - jnp.mean(e, axis=-1, keepdims=True)


class DreamSim:
    """dreamsim(img0_01, img1_01) -> distance per pair [B].

    `params`: {backbone_name: flax variables} (plus 'mlp' when use_mlp),
    e.g. from `tools.torch_import.dreamsim_from_torch`.  None = random
    init (untrained but structurally exact metric).
    """

    def __init__(self, params: Optional[Dict] = None,
                 dreamsim_type: str = "ensemble", image_size: int = 224,
                 use_mlp: bool = False, hidden_size: int = 512,
                 normalize_embeds: bool = True,
                 vit_overrides: Optional[Dict] = None):
        self.config = MODEL_CONFIGS[dreamsim_type]
        self.image_size = image_size
        self.normalize_embeds = normalize_embeds
        self.backbones = {}
        for name, _ in self.config:
            kw = {k: v for k, v in BACKBONES[name].items()
                  if k not in ("mean", "std")}
            kw.update(vit_overrides or {})
            self.backbones[name] = ViTB16(image_size=image_size, **kw)
        # per-backbone dims (model.py:249-263); read off the constructed
        # modules so vit_overrides (tiny test configs) stay consistent
        self.embed_size = sum(
            self.backbones[n].proj_dim if f == "embedding"
            else self.backbones[n].dim for n, f in self.config)
        self.mlp = (DreamSimMLP(self.embed_size, hidden_size)
                    if use_mlp else None)
        if params is None:
            params = {}
            for i, (name, _) in enumerate(self.config):
                x0 = jnp.zeros((1, image_size, image_size, 3))
                params[name] = self.backbones[name].init(
                    jax.random.PRNGKey(i), x0)
            if self.mlp is not None:
                params["mlp"] = self.mlp.init(
                    jax.random.PRNGKey(99), jnp.zeros((1, self.embed_size)))
        self.params = params

        def embed(params, x01):
            feats = []
            for name, feat in self.config:
                bb = BACKBONES[name]
                xin = (x01 - bb["mean"]) / bb["std"]
                outs = self.backbones[name].apply(params[name], xin)
                feats.append(outs[feat])
            e = jnp.concatenate(feats, axis=-1)
            if self.mlp is not None:
                e = self.mlp.apply(params["mlp"], e)
            if self.normalize_embeds:
                e = normalize_embedding(e)
            return e

        self._embed = jax.jit(embed)

    def _prep(self, img01: np.ndarray) -> jnp.ndarray:
        # reference preprocess: bicubic resize to img_size (model.py:231-235)
        return jax.image.resize(jnp.asarray(img01, jnp.float32),
                                (img01.shape[0], self.image_size,
                                 self.image_size, 3), "bicubic")

    def embed(self, img01: np.ndarray) -> jnp.ndarray:
        # mesh-aware on multi-chip hosts: replicate the ensemble params
        # once, shard the image batch when it divides the device count
        # (no-op on one device / ragged batches)
        from aqualora_tpu.core import sharding as sh
        x = self._prep(img01)
        mesh = sh.data_mesh_or_none(len(img01))
        if mesh is not None:
            n_data = mesh.devices.size
            cache = getattr(self, "_mesh_params", None) or {}
            if n_data not in cache:     # keyed: ragged tails change gcd
                cache[n_data] = sh.replicate(mesh, self.params)
                self._mesh_params = cache
            return self._embed(cache[n_data], sh.shard_batch(mesh, x))
        # device_put ONCE: host-numpy ensemble trees (dreamsim_from_torch)
        # passed as jit args would re-upload the full ViT ensemble on
        # every embed call over the single-chip path
        if getattr(self, "_dev_params", None) is None:
            self._dev_params = jax.device_put(self.params)
        return self._embed(self._dev_params, x)

    def __call__(self, img0_01: np.ndarray, img1_01: np.ndarray) -> np.ndarray:
        e0 = self.embed(img0_01)
        e1 = self.embed(img1_01)
        cos = jnp.sum(e0 * e1, axis=-1) / (
            jnp.linalg.norm(e0, axis=-1) * jnp.linalg.norm(e1, axis=-1))
        return np.asarray(1.0 - cos)
