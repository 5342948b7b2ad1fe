"""Mesh construction and sharding helpers (jax.sharding / pjit).

The reference is single-process single-GPU (SURVEY §2.10); this module is
the TPU-native replacement: a `Mesh` over the chips of a slice with a
`data` axis (pure DP baseline — all CellViT variants fit per-chip, SAM-H is
~630M params ≈ 2.5 GB f32) and an optional `model` axis for tensor
sharding of the largest encoders. XLA inserts the gradient psums from the
shardings; no hand-written collectives in the training path.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
batch helpers operate on per-host shards via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Pytree = Union[Dict, Sequence, jax.Array]


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Defaults to all devices on the data
    axis; n_model > 1 carves a model axis for tensor sharding."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}×{n_model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def seq_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sequence parallelism: shard (B, N, C) token activations — batch on
    `data`, tokens on `axis`. Pass as `token_spec=` to the CellViT / ViT
    models; GSPMD partitions the attention/MLP einsums over the token axis
    and inserts the K/V all-gathers (new capability vs the reference —
    SURVEY §5 long-context note). Uneven token counts (N=4097) are
    handled by GSPMD padding."""
    return NamedSharding(mesh, P("data", axis, None))


def shard_batch(batch: Pytree, mesh: Mesh) -> Pytree:
    """Place a host batch (numpy pytree) on the mesh, batch-axis sharded.

    Works single-host (device_put with sharding) and multi-host (each
    process provides its local shard of the global batch).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_or_place(batch: Pytree, mesh: Mesh) -> Pytree:
    """`shard_batch` when the leading axis divides the data axis; otherwise
    place the batch unsharded on the default device (ragged validation
    tails recompile once for their shape instead of crashing)."""
    n_data = mesh.shape["data"]
    lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if lead % n_data == 0:
        return shard_batch(batch, mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), batch)


def pad_batch_to(batch: Pytree, size: int) -> Pytree:
    """Right-pad the leading axis of every leaf to `size` (static batch
    shapes for jit; use a mask to ignore padded rows)."""

    def pad(x):
        x = np.asarray(x)
        if x.shape[0] == size:
            return x
        pad_width = [(0, size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    return jax.tree_util.tree_map(pad, batch)
