"""Mesh / sharding utilities — the TPU-native replacement for the
reference's HF-Accelerate DDP (`train/ppft_train.py:479-484,904-912`).

The reference's only parallelism is data parallelism over NCCL.  Here the
equivalent is a 1-D (or 2-D data x model) `jax.sharding.Mesh`; batches are
sharded over the `data` axis, parameters are replicated (optionally sharded
over `model` for tensor parallelism of the attention/ff matmuls), and XLA
emits the gradient all-reduce over ICI from the sharding annotations alone.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a (data, model) mesh. Defaults to pure DP over all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_data_mesh(global_batch: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Pure-DP mesh sized to the largest device count dividing the batch
    (a batch of 2 on an 8-device host uses 2 devices, not a crash).
    NOT gcd: batch 6 on 8 devices should use 6 devices (gcd says 2)."""
    if devices is None:
        devices = jax.devices()
    global_batch = max(1, global_batch)
    n = max(d for d in range(1, min(global_batch, len(devices)) + 1)
            if global_batch % d == 0)
    return make_mesh(devices[:n])


def data_mesh_or_none(global_batch: int,
                      devices: Optional[Sequence[jax.Device]] = None
                      ) -> Optional[Mesh]:
    """make_data_mesh, or None when it would span a single device (the
    single-chip serving path: callers then skip resharding and just
    device_put).  One home for the mesh-or-not decision shared by
    simple_sample / simple_decode / bench.py."""
    mesh = make_data_mesh(global_batch, devices)
    return mesh if mesh.devices.size > 1 else None


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Put a host pytree onto the mesh, batch-sharded on the leading axis."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def fsdp_spec(x: Any, mesh: Mesh, axis: str = DATA_AXIS,
              min_size: int = 2 ** 14) -> P:
    """ZeRO/FSDP-style spec for one leaf: shard the largest dimension
    divisible by the mesh axis; replicate small leaves (norm scales,
    optimizer counts) and leaves with no divisible dimension.

    With the batch sharded over the same axis, annotating weights and
    optimizer moments this way is all GSPMD needs: XLA inserts the
    per-layer all-gathers before use and keeps the elementwise optimizer
    update sharded (grads arrive via reduce-scatter instead of
    all-reduce) — the TPU equivalent of ZeRO-1/weight-FSDP without any
    manual collective code (replaces DeepSpeed/torch-FSDP wrapping; the
    reference's accelerate DDP has no counterpart,
    train/ppft_train.py:479-484)."""
    n = mesh.shape[axis]
    shape = getattr(x, "shape", ())
    if n <= 1 or np.prod(shape, dtype=np.int64) * max(
            getattr(x, "dtype", np.dtype("f4")).itemsize, 1) < min_size:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % n == 0]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_fsdp(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """device_put every leaf with its `fsdp_spec` sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x, mesh, axis))), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n


def is_main_process() -> bool:
    """Rank-0 guard — replaces `accelerator.is_main_process`."""
    return jax.process_index() == 0
