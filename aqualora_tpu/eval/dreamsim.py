"""DreamSim perceptual distance (replaces vendored `evaluation/dreamsim/`).

The reference's `PerceptualModel` ensembles DINO / CLIP / OpenCLIP ViT-B/16
embeddings (LoRA-finetuned) and measures cosine distance
(`dreamsim/model.py:14-142`).  Here: N generic ViT-B/16 backbones whose
(importable) weights define the metric; embeddings are unit-normalized,
concatenated, and compared by cosine distance — the same ensemble scheme.
Random-init weights still yield a valid (untrained) perceptual distance
for plumbing and relative comparisons.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.models.vit import ViTB16

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DreamSim:
    """dreamsim(img0_01, img1_01) -> distance per pair [B]."""

    def __init__(self, n_backbones: int = 3,
                 params: Optional[List[Dict]] = None,
                 image_size: int = 224):
        self.backbones = [ViTB16(image_size=image_size)
                          for _ in range(n_backbones)]
        if params is None:
            params = [m.init(jax.random.PRNGKey(i),
                             jnp.zeros((1, image_size, image_size, 3)))
                      for i, m in enumerate(self.backbones)]
        self.params = params
        self.image_size = image_size

        def embed(params_list, x):
            outs = []
            for m, p in zip(self.backbones, params_list):
                cls, _ = m.apply(p, x)
                outs.append(cls / (jnp.linalg.norm(cls, axis=-1,
                                                   keepdims=True) + 1e-8))
            e = jnp.concatenate(outs, axis=-1)
            return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

        self._embed = jax.jit(embed)

    def _prep(self, img01: np.ndarray) -> jnp.ndarray:
        x = jax.image.resize(jnp.asarray(img01),
                             (img01.shape[0], self.image_size,
                              self.image_size, 3), "bilinear")
        return (x - _IMAGENET_MEAN) / _IMAGENET_STD

    def __call__(self, img0_01: np.ndarray, img1_01: np.ndarray) -> np.ndarray:
        e0 = self._embed(self.params, self._prep(img0_01))
        e1 = self._embed(self.params, self._prep(img1_01))
        return np.asarray(1.0 - jnp.sum(e0 * e1, axis=-1))
