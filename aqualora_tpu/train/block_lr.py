"""Block-wise learning rate + rank dropout — the kohya LoRANetwork
training extras (`scripts/lib/lora.py`), TPU-native.

- Block-wise LR (`lib/lora.py:559-680`): per-U-Net-depth LR multipliers.
  Presets `cosine/sine/linear/reverse_linear/zeros[+base]` or comma lists
  of 12 values per side, mid is a single value; block index mapping
  matches kohya's `get_block_index` (`:662-680`: down -> 1+3i+j,
  mid -> 12, up -> 13+3i+j).  Implemented as an optax transform that
  scales each LoRA update by its block's weight — mathematically the
  per-group LR kohya builds via optimizer param groups (`:840-860`).
- Rank dropout (`lib/lora.py:101-112`): drop rank channels with prob p
  and rescale by 1/(1-p).  In this framework the LoRA rank dimension is
  modulated by the traced diag scale, so the mask folds into the scale —
  no module rewrite, no retrace.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

NUM_OF_BLOCKS = 12          # per side (lib/lora.py LoRANetwork.NUM_OF_BLOCKS)


def parse_lr_weight_list(spec: Optional[str]) -> Optional[List[float]]:
    """Preset name (`cosine/sine/linear/reverse_linear/zeros`, optional
    `+base`) or comma-separated floats -> 12 weights
    (lib/lora.py:568-586; short lists padded with 1.0 per :600-609)."""
    if spec is None:
        return None
    n = NUM_OF_BLOCKS

    def warn():
        # kohya warns and disables block LR on a bad spec
        # (lib/lora.py:592-598) instead of crashing on a typo
        print(f"block LR weight spec {spec!r} is not a preset "
              "(cosine/sine/linear/reverse_linear/zeros[+base]) or a "
              "comma float list — block-wise LR disabled for this side")

    name, _, base_s = spec.partition("+")
    if name in ("cosine", "sine", "linear", "reverse_linear", "zeros"):
        try:
            base = float(base_s) if base_s else 0.0
        except ValueError:
            warn()
            return None
        if name == "cosine":
            w = [math.sin(math.pi * (i / (n - 1)) / 2) + base
                 for i in reversed(range(n))]
        elif name == "sine":
            w = [math.sin(math.pi * (i / (n - 1)) / 2) + base
                 for i in range(n)]
        elif name == "linear":
            w = [i / (n - 1) + base for i in range(n)]
        elif name == "reverse_linear":
            w = [i / (n - 1) + base for i in reversed(range(n))]
        else:
            w = [base] * n
        return w
    # not a preset: comma float list (split on ',' only, so scientific
    # notation like '1e+2' survives — no '+' pre-splitting)
    try:
        w = [float(x) for x in spec.split(",")]
    except ValueError:
        warn()
        return None
    return (w + [1.0] * n)[:n]


def block_index(path: Tuple[str, ...]) -> int:
    """kohya get_block_index (lib/lora.py:662-680) over our flax paths
    ('down_blocks_0', 'attentions_1', ...)."""
    kind = path[0]
    if kind == "mid_block":
        return NUM_OF_BLOCKS
    i = int(kind.rsplit("_", 1)[1])
    j = int(path[1].rsplit("_", 1)[1])
    idx = 3 * i + j
    if kind.startswith("down"):
        return 1 + idx
    return NUM_OF_BLOCKS + 1 + idx


def lr_weight_for_path(path: Tuple[str, ...],
                       down: Optional[List[float]],
                       mid: Optional[float],
                       up: Optional[List[float]],
                       zero_threshold: float = 0.0) -> float:
    idx = block_index(path)
    if idx == NUM_OF_BLOCKS:
        w = 1.0 if mid is None else mid
    elif idx < NUM_OF_BLOCKS:
        w = 1.0 if down is None else down[idx]
    else:
        w = 1.0 if up is None else up[idx - NUM_OF_BLOCKS - 1]
    return w if w > zero_threshold else 0.0


def scale_lora_updates_by_block(down: Optional[List[float]],
                                mid: Optional[float],
                                up: Optional[List[float]],
                                zero_threshold: float = 0.0
                                ) -> optax.GradientTransformation:
    """Scale each update leaf under a 'lora' path component by its block
    weight; everything else (e.g. the mapper) is untouched."""

    def weight_tree(updates):
        flat = jax.tree_util.tree_flatten_with_path(updates)[0]

        def w_for(keypath):
            parts = tuple(str(getattr(k, "key", getattr(k, "name", k)))
                          for k in keypath)
            if "lora" not in parts:
                return 1.0
            start = next((i for i, p in enumerate(parts)
                          if p == "mid_block" or p.startswith("down_blocks_")
                          or p.startswith("up_blocks_")), None)
            if start is None:
                return 1.0
            return lr_weight_for_path(parts[start:], down, mid, up,
                                      zero_threshold)
        return [w_for(kp) for kp, _ in flat]

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        ws = weight_tree(updates)
        scaled = [u * w for u, w in zip(leaves, ws)]
        return jax.tree_util.tree_unflatten(treedef, scaled), state

    return optax.GradientTransformation(init, update)


def rank_dropout_scale(key: jax.Array, diag: jnp.ndarray,
                       p: float) -> jnp.ndarray:
    """Fold kohya rank dropout (lib/lora.py:101-112) into the traced diag
    scale: mask ~ Bernoulli(1-p) per (batch, rank), rescaled by 1/(1-p)."""
    if p <= 0.0:
        return diag
    mask = jax.random.bernoulli(key, 1.0 - p, diag.shape)
    return diag * mask.astype(diag.dtype) / (1.0 - p)
