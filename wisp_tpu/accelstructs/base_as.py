"""BaseAS + query/trace result containers.

Counterpart of reference wisp/accelstructs/base_as.py:17-167. The packed variable-length
results of the reference (ridx/pidx/depth nugget streams) become fixed-shape padded buffers
with validity masks — the XLA-native formulation (SURVEY.md §7 design mapping):

* ASQueryResults.pidx: [N] (or [N, L+1] with parents), -1 = miss — unchanged semantics.
* ASRaytraceResults: per-ray interval buffers [R, K] (pidx, t_entry, t_exit, mask) instead of
  packed nugget lists; K is a static capacity.
* ASRaymarchResults: rectangular sample grids [R, S] (samples, depths, deltas, mask) instead
  of packed samples + boundary arrays. ``ridx``/``boundary``/``pack_info`` equivalents are
  implicit in the rectangular layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.tree_util as jtu


@jtu.register_dataclass
@dataclasses.dataclass
class ASQueryResults:
    """Result of a point query (reference base_as.py:18-33)."""
    pidx: jax.Array  # [N] or [N, level+1] cell indices into the level table; -1 = miss


@jtu.register_dataclass
@dataclasses.dataclass
class ASRaytraceResults:
    """Ray/cell intersections (reference base_as.py:35-56), fixed capacity per ray."""
    pidx: jax.Array     # [R, K] intersected cell index at the traced level; -1 pad
    t_entry: jax.Array  # [R, K] entry depth per intersection
    t_exit: jax.Array   # [R, K] exit depth per intersection
    mask: jax.Array     # [R, K] validity
    overflow: jax.Array = None  # [R] bool — capacity saturated, intervals were dropped


@jtu.register_dataclass
@dataclasses.dataclass
class ASRaymarchResults:
    """March samples (reference base_as.py:58-84), rectangular + masked."""
    samples: jax.Array        # [R, S, 3] sample coordinates
    depth_samples: jax.Array  # [R, S] sample depths along ray
    deltas: jax.Array         # [R, S] inter-sample step sizes
    mask: jax.Array           # [R, S] sample validity (inside occupied cells)
    cell_density: jax.Array = None  # [R, S] per-sample density EMA (0 until pruning runs)
    pidx: Optional[jax.Array] = None  # [R, S] cell index per sample (when available)
    # scalar count of rays whose occupied (and, with coarse early termination, still
    # visible) segment count exceeded the marcher's per-ray capacity — dropped content is
    # COUNTED, never silent (honesty contract shared with PackedSDFTracer.num_overflow)
    num_overflow: Optional[jax.Array] = None


class BaseAS:
    """Acceleration structure interface (reference base_as.py:87-167)."""

    # Accel structures are scene topology/occupancy state, never optimizer parameters:
    # the whole subtree (octree words, occupancy bitfields, density EMA fields) is
    # excluded from the trainable split (utils/filter.py buffer_paths). The reference
    # never registers its SPC tensors as nn.Parameters either.
    __trainable__ = False

    def query(self, coords, level=None, with_parents: bool = False) -> ASQueryResults:
        raise NotImplementedError

    def raytrace(self, rays, level=None, with_exit: bool = False) -> ASRaytraceResults:
        raise NotImplementedError

    def raymarch(self, rays, raymarch_type: str, num_samples: int,
                 level=None) -> ASRaymarchResults:
        raise NotImplementedError

    def occupancy(self):
        """Number of occupied cells per level (reference octree_as.py:431-437)."""
        raise NotImplementedError

    def capacity(self):
        """Total cell capacity per level."""
        raise NotImplementedError

    def name(self) -> str:
        return type(self).__name__

    def public_properties(self) -> dict:
        return {}
