"""SPCField — renders raw SPC attributes (colors/normals) with no decoder.

Counterpart of reference wisp/models/nefs/spc_field.py:19-157: a 'neural' field whose
features are direct per-cell attributes (e.g. averaged pointcloud colors), indexed by the
hit cell index from the tracer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from wisp_tpu.models.nefs.base_nef import BaseNeuralField


class SPCField(BaseNeuralField):
    def __init__(self, blas=None, colors=None, normals=None):
        """Args:
            blas: OctreeAS whose leaf cells carry attributes.
            colors: [num_leaf_cells, 3or4] per-cell colors in morton order (e.g. from
                pointcloud_to_octree attribute averaging).
            normals: optional [num_leaf_cells, 3] per-cell normals.
        """
        self.grid = _SPCGridShim(blas)
        self.colors = None if colors is None else jnp.asarray(colors)[..., :3]
        self.normals = None if normals is None else jnp.asarray(normals)
        super().__init__()

    def register_forward_functions(self):
        self._register_forward_function(self.rgba, ["rgb", "alpha"])

    def rgba(self, ridx_hit=None, pidx=None, coords=None, lod_idx=None):
        """Color of hit cells: indexed by pidx when attributes exist, white otherwise
        (reference spc_field.py:105-157)."""
        if pidx is None:
            n = coords.shape[0] if coords is not None else 0
            pidx = jnp.zeros((n,), jnp.int32)
        if self.colors is not None:
            safe = jnp.maximum(pidx, 0)
            rgb = self.colors[safe]
        else:
            rgb = jnp.ones((pidx.shape[0], 3), jnp.float32)
        alpha = (pidx >= 0).astype(jnp.float32)[:, None]
        return {"rgb": rgb * alpha, "alpha": alpha}

    def public_properties(self) -> Dict[str, Any]:
        return {"Attributes": "colors" if self.colors is not None else "none"}


class _SPCGridShim:
    """Minimal BLASGrid-like shim binding an OctreeAS directly (the SPCField has no learned
    features — reference wraps it in an OctreeGrid-of-attributes)."""

    def __init__(self, blas):
        self.blas = blas
        self.num_lods = 1
        self.active_lods = (blas.max_level,) if blas is not None else (0,)

    def raytrace(self, rays, level=None, with_exit=False):
        return self.blas.raytrace(rays, level=level)

    def raymarch(self, rays, **kw):
        return self.blas.raymarch(rays, **kw)
