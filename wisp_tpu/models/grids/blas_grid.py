"""BLASGrid — abstract feature grid backed by a bottom-level acceleration structure.

Counterpart of reference wisp/models/grids/blas_grid.py:15-75: a grid owns (a) learnable
features and (b) a BLAS (octree / AABB) tracking occupancy; spatial queries and ray ops
delegate to the BLAS, feature lookup is the grid's own ``interpolate``.
"""

from __future__ import annotations

from typing import Any, Dict

from wisp_tpu.core.module import Module


class BLASGrid(Module):
    """Base class for all feature grids (HashGrid / OctreeGrid / TriplanarGrid /
    CodebookOctreeGrid)."""

    blas = None  # set by subclasses

    # ``occupancy`` is the pruning density EMA (NeuralRadianceField.prune), a buffer —
    # updated by the jitted prune, never by the optimizer (utils/filter.py buffer_paths).
    __buffers__ = ("occupancy",)

    @classmethod
    def supported_blas(cls):
        """Which acceleration structures this grid can use (reference blas_grid.py:29-35)."""
        return []

    # -- BLAS delegation (reference blas_grid.py:37-50) ---------------------------------------
    def raymarch(self, rays, *args, **kwargs):
        return self.blas.raymarch(rays, *args, **kwargs)

    def raytrace(self, rays, *args, **kwargs):
        return self.blas.raytrace(rays, *args, **kwargs)

    def query(self, coords, *args, **kwargs):
        return self.blas.query(coords, *args, **kwargs)

    # -- feature lookup -----------------------------------------------------------------------
    def interpolate(self, coords, lod_idx):
        """[N, d] coords in [-1,1] -> [N, feature_dim or num_lods*feature_dim] features."""
        raise NotImplementedError

    def public_properties(self) -> Dict[str, Any]:
        return {"Acceleration structure": type(self.blas).__name__ if self.blas else "None"}
