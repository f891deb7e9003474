"""Data-parallel scale-out over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4 — no torch.distributed anywhere); this
module is new TPU capability: rays are embarrassingly parallel, so training shards the ray
batch over an ICI mesh while parameters stay replicated. Implemented the GSPMD way — inputs
are *placed* with ``NamedSharding`` (batch split on the ray axis, params replicated) and the
jitted global-view step lets XLA insert the gradient ``psum`` (all-reduce over ICI)
automatically. Hash tables comfortably fit per-chip HBM (SURVEY.md §5.8), so replication is
the right default; table sharding + all_gather lookup is the escape hatch when they don't.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(num_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch on the mesh: arrays whose leading axis divides the mesh are split
    on it, everything else (scalars, metadata) replicated."""
    shard = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    n = mesh.devices.size

    def _place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(_place, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate parameters / optimizer state across the mesh."""
    repl = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if isinstance(x, jax.Array) else x, tree)


def num_devices() -> int:
    return jax.device_count()
