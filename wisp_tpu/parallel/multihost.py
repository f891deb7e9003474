"""Multi-host (multi-process) input pipeline for pod-scale training.

The reference has no distributed story at all (SURVEY.md §2.4 — single GPU, no
torch.distributed); this module is new TPU capability, SURVEY.md §5.8 / §7 step 9. On a
TPU pod, each host process owns a slice of the devices and must feed ONLY its local
addressable shard of every global batch; the global jax.Array is assembled from the
per-process pieces with :func:`jax.make_array_from_process_local_data` and collectives
then ride ICI, never DCN. The pattern:

    views   = ProcessShardedDataset(dataset)          # this host reads 1/P of the views
    batch   = views[i]                                # local rays/rgb only
    gbatch  = global_batch_from_local(batch, mesh)    # global array, local shards placed
    trainer.run_step(gbatch)                          # one GSPMD step; psum over ICI

Single-process (process_count == 1) degenerates exactly to
:func:`wisp_tpu.parallel.shard_batch` — verified in tests/core/test_parallel.py — so the
same trainer code runs from a laptop CPU mesh to a pod. True multi-process execution
requires `jax.distributed.initialize` on real multi-host hardware, which this environment
(one tunneled chip, one process) cannot exercise; the partition logic is therefore
simulatable by injecting process_index/process_count, and the dryrun covers the
process_count=1 assembly path end-to-end.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wisp_tpu.parallel.data_parallel import DATA_AXIS, batch_sharding, replicated


def process_view_split(num_items: int, process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> List[int]:
    """Deterministic per-host partition of dataset items (views): strided so every host
    gets a balanced, disjoint, covering subset regardless of dataset ordering."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for process_count {pc}")
    return list(range(pi, num_items, pc))


class ProcessShardedDataset:
    """A view of a multiview dataset restricted to this process's item shard.

    Each host loads/decodes only its own views (the DCN input pipeline: raw data I/O is
    per-host, device placement is per-host-local, assembly is logical). Everything else
    (attributes, transform) passes through to the wrapped dataset.
    """

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self._dataset = dataset
        self.local_indices = process_view_split(len(dataset), process_index,
                                                process_count)

    def __len__(self) -> int:
        return len(self.local_indices)

    def __getitem__(self, i: int):
        return self._dataset[self.local_indices[i]]

    def __getattr__(self, name):
        # Guard against infinite recursion during unpickling/copy: before __init__ runs,
        # '_dataset' is absent and a naive delegate would re-enter __getattr__ forever.
        # Dunder lookups (e.g. __getstate__, __deepcopy__) must also fail fast rather than
        # delegate, or copy/pickle protocols silently pick up the wrapped dataset's.
        if name == "_dataset" or (name.startswith("__") and name.endswith("__")):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "_dataset"), name)


def global_batch_from_local(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Assemble global device arrays from this process's LOCAL batch shard.

    Arrays whose leading axis is per-process batch data become global arrays sharded on
    ``axis_name`` (global shape = local_rows * process_count). Scalars and 0-d leaves are
    replicated — replicated leaves MUST be identical on every process (each host
    device_puts its own value; divergent values would silently disagree across hosts).

    Placement is explicit, not heuristic: any leaf with a leading axis ≥ local device
    count whose leading dim does NOT divide the local device count raises in
    multi-process runs instead of silently replicating process-local data (which would
    assemble a 'replicated' global array from divergent per-host shards). Pad the
    per-host batch to a multiple of the local device count, or reshape the leaf to 0-d/
    small-leading-dim if it is genuinely replicated metadata.

    With one process this is numerically identical to ``shard_batch`` (the local data IS
    the global data)."""
    shard = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    n_local_dev = len([d for d in mesh.devices.flat if d.process_index
                       == jax.process_index()]) or 1
    multiprocess = jax.process_count() > 1

    def _place(x):
        try:
            arr = np.asarray(x) if not isinstance(x, (jax.Array, np.ndarray)) else x
        except Exception:
            return x
        if arr.dtype == object:
            return x  # non-numeric metadata stays host-side
        if arr.ndim >= 1 and arr.shape[0] >= n_local_dev:
            if arr.shape[0] % n_local_dev == 0:
                return jax.make_array_from_process_local_data(shard, np.asarray(arr))
            if multiprocess:
                raise ValueError(
                    f"global_batch_from_local: leaf with shape {arr.shape} has a leading "
                    f"dim that is not divisible by the local device count {n_local_dev}; "
                    f"replicating process-local data across hosts would be silently "
                    f"inconsistent. Pad the per-host batch to a multiple of "
                    f"{n_local_dev}, or make the leaf 0-d/small if it is replicated "
                    f"metadata (identical on every process).")
        return jax.device_put(np.asarray(arr), repl)

    return jax.tree_util.tree_map(_place, batch)
