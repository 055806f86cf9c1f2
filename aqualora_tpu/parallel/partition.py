"""Parameter partition specs — tensor parallelism for the U-Net.

The reference has data parallelism only (SURVEY.md §2.5); at SD-1.5 scale
DP is usually enough, but the attention/ff matmuls shard cleanly over a
`model` mesh axis (Megatron-style column/row parallel pairs), and XLA's
GSPMD inserts the collectives from these specs alone:

  to_q/to_k/to_v kernels  [in, out]   -> P(None, 'model')   (column)
  to_out kernel           [in, out]   -> P('model', None)   (row)
  ff net_0 proj (GEGLU)   [in, 2*mid] -> P(None, 'model')
  ff net_2                [mid, out]  -> P('model', None)
  LoRA + convs + norms    replicated  (rank-320 is small; convs are the
                                       channel-local part of the model)

Use: specs = unet_partition_specs(params); shard_params(mesh, params, specs).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import traverse_util as tu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aqualora_tpu.core.sharding import MODEL_AXIS

_COL = {"to_q", "to_k", "to_v"}


def _spec_for(path) -> P:
    if "lora" in path:
        return P()
    leaf = path[-1]
    if leaf != "kernel":
        return P()
    parent = path[-2]
    if parent in _COL:
        return P(None, MODEL_AXIS)
    if parent == "to_out_0":
        return P(MODEL_AXIS, None)
    if len(path) >= 3 and path[-3] == "net_0" and parent == "proj":
        return P(None, MODEL_AXIS)
    if parent == "net_2":
        return P(MODEL_AXIS, None)
    return P()


def unet_partition_specs(params: Dict) -> Dict:
    flat = tu.flatten_dict(params)
    return tu.unflatten_dict({k: _spec_for(k) for k in flat})


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
