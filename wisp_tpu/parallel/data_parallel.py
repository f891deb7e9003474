"""Data-parallel scale-out over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4 — no torch.distributed anywhere); this
module is new TPU capability: rays are embarrassingly parallel, so training shards the ray
batch over an ICI mesh while parameters stay replicated. Inputs are *placed* with
``NamedSharding`` (batch split on the ray axis, params replicated) and the loss+grad is run
under ``jax.shard_map`` so every per-ray stage — marching, COMPACTION, interpolation,
decode, backward — is chip-local and the ONLY cross-chip communication is the gradient
all-reduce (``pmean`` over the dp axis).

Why shard_map and not a plain global-view jit: the compaction step selects the first
``budget`` valid samples of the GLOBAL [B, S] mask (ops/compaction.py), which GSPMD can only
implement by all-gathering the mask and the sample arrays to every chip — an HLO audit of
the round-2 global-view step showed exactly that (cross-device all-gathers attributed to
``masked_compact_indices``). Under shard_map each chip compacts its own ray shard into a
budget scaled to the local shape, which is also the statistically right thing (per-chip
truncation instead of global-prefix truncation that could starve late shards).
``tests/core/test_parallel.py::test_dp_step_collectives_are_gradient_only`` pins this: the
compiled dp step contains all-reduces only, no all-gather / all-to-all / collective-permute.

Hash tables comfortably fit per-chip HBM (SURVEY.md §5.8), so replication is the right
default; table sharding + all_gather lookup is the escape hatch when they don't.
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


def batch_partition_specs(batch, num_devices: int, axis_name: str = DATA_AXIS):
    """Per-leaf ``PartitionSpec`` tree for a host batch: arrays whose leading axis divides
    the mesh are split on it, everything else (scalars, metadata) replicated. Mirrors the
    placement rule of :func:`shard_batch` so shard_map in_specs agree with how the arrays
    were device_put."""

    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % num_devices == 0 \
                and x.shape[0] >= num_devices:
            return P(axis_name)
        return P()

    return jax.tree_util.tree_map(spec_of, batch)


def dp_shard_map(value_and_grad_fn, mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Wrap ``value_and_grad_fn(diff, nondiff, batch, key) -> (loss, aux, grads)`` in a
    shard_map over the dp axis: batch split per the :func:`batch_partition_specs` rule,
    params/grads replicated, loss/grads pmean'd, aux reduced (psum for ``num_*`` count
    keys, pmean otherwise). The per-shard rng key is decorrelated with ``fold_in`` of the
    shard index. Callable inside jit (specs are derived from the traced batch's static
    shapes)."""
    n = mesh.devices.size

    def per_shard(diff, nondiff, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        loss, aux, grads = value_and_grad_fn(diff, nondiff, batch, key)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis_name), grads)
        aux = {k: (jax.lax.psum(v, axis_name) if k.startswith("num_")
                   else jax.lax.pmean(v, axis_name)) for k, v in aux.items()}
        return loss, aux, grads

    return jax.shard_map(per_shard, mesh=mesh,
                         in_specs=(P(), P(), batch_partition_specs(batch, n, axis_name),
                                   P()),
                         out_specs=(P(), P(), P()),
                         check_vma=False)


def replicate_tree(tree, mesh: Mesh):
    """Replicate parameters / optimizer state across the mesh."""
    repl = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if isinstance(x, jax.Array) else x, tree)


def num_devices() -> int:
    return jax.device_count()
