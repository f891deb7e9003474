"""OctreeGrid — NGLOD-style features on sparse octree dual vertices.

Counterpart of reference wisp/models/grids/octree_grid.py:20-248. Features live on the dual
octree's vertices (cell corners) for each active LOD; interpolation is: query the cell index
per level (binary search on the morton table — kaolin unbatched_query equivalent), gather the
cell's 8 corner features through trinkets, and blend trilinearly (kaolin
unbatched_interpolate_trilinear equivalent, fused by XLA instead of a fp16 CUDA kernel).

Replicated semantics:
* base_lod = blas.max_level - num_lods + 1; active_lods = [base_lod .. max_level]
  (reference octree_grid.py:63-71).
* multi-LOD interpolate queries with_parents and slices indices per level
  (reference :165-219); missing cells yield zero features.
* raymarch happens at base_lod — the coarsest level with features (reference :221-226).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.models.grids.blas_grid import BLASGrid
from wisp_tpu.ops.grid import grid_interpolate
from wisp_tpu.ops.spc.core import make_dual, quantize_points_jnp


class OctreeGrid(BLASGrid):
    def __init__(self,
                 blas=None,
                 feature_dim: int = 16,
                 num_lods: int = 1,
                 interpolation_type: str = "linear",   # 'linear' | 'closest'
                 multiscale_type: str = "cat",
                 feature_std: float = 0.0,
                 feature_bias: float = 0.0,
                 *,
                 key=None):
        assert blas is not None and blas.codes is not None, \
            "OctreeGrid requires a sparse OctreeAS (with level tables)"
        self.blas = blas
        self.feature_dim = feature_dim
        self.max_lod = blas.max_level
        self.num_lods = num_lods
        self.base_lod = self.max_lod - num_lods + 1
        self.interpolation_type = interpolation_type
        self.multiscale_type = multiscale_type
        self.feature_std = feature_std
        self.feature_bias = feature_bias
        self.active_lods = tuple(self.base_lod + x for x in range(num_lods))
        self.frozen = False
        self.occupancy = None  # octree grids don't prune (reference prunes hash/triplanar only)

        if key is None:
            key = jax.random.PRNGKey(0)
        if num_lods > 0:
            self.init_feature_structure(key)

    def init_feature_structure(self, key):
        """Dual octree + trinkets + per-LOD feature allocation
        (reference octree_grid.py:79-107)."""
        points_per_level = [np.asarray(p) for p in self.blas.points]
        if self.interpolation_type == "linear":
            dual_points, trinkets = make_dual(points_per_level)
            self.trinkets = [jnp.asarray(trinkets[lod]) for lod in self.active_lods]
            counts = [dual_points[lod].shape[0] for lod in self.active_lods]
        else:  # 'closest': one feature per cell
            self.trinkets = None
            counts = [points_per_level[lod].shape[0] for lod in self.active_lods]
        self.num_feat = sum(counts) * self.feature_dim

        keys = jax.random.split(key, len(counts))
        self.features = [
            self.feature_bias + self.feature_std * jax.random.normal(
                k, (n, self.feature_dim), jnp.float32)
            for k, n in zip(keys, counts)
        ]

    def freeze(self) -> "OctreeGrid":
        """Stop feature gradients (reference octree_grid.py:109 freeze)."""
        return self.replace(frozen=True)

    # -- feature indexing hook (overridden by CodebookOctreeGrid) ------------------------------
    def _index_features(self, feats, idx, lod_idx):
        """[...,] indices -> [..., feature_dim] features (reference octree_grid.py:120-134).
        Routed through gather_rows so the backward uses per-column 1-D scatter-adds
        (~5x faster than the windowed row scatter JAX's gather transpose emits on TPU)."""
        if self.frozen:
            feats = jax.lax.stop_gradient(feats)
        from wisp_tpu.ops.grid import gather_rows
        flat = gather_rows(feats, idx.reshape(-1))
        return flat.reshape(*idx.shape, feats.shape[-1])

    def _interpolate(self, coords, feats, pidx, lod_idx):
        """Trilinear blend of one LOD's corner features at coords [N, 3]
        (reference octree_grid.py:136-166 via kaolin's CUDA kernel)."""
        level = self.active_lods[lod_idx]
        res = 2 ** level
        if self.interpolation_type == "linear":
            safe_pidx = jnp.maximum(pidx, 0)
            corner_idx = self.trinkets[lod_idx][safe_pidx]         # [N, 8]
            corner_feats = self._index_features(feats, corner_idx, lod_idx)  # [N, 8, F]
            cell = quantize_points_jnp(coords, level).astype(coords.dtype)
            frac = jnp.clip((coords + 1.0) * (res / 2.0) - cell, 0.0, 1.0)
            fs = grid_interpolate(frac, corner_feats)
        elif self.interpolation_type == "closest":
            safe_pidx = jnp.maximum(pidx, 0)
            fs = self._index_features(feats, safe_pidx, lod_idx)
        else:
            raise NotImplementedError(self.interpolation_type)
        return jnp.where((pidx >= 0)[:, None], fs, 0.0)

    def interpolate(self, coords, lod_idx):
        """Multiscale feature query (reference octree_grid.py:168-219)."""
        output_shape = coords.shape[:-1]
        flat = coords.reshape(-1, 3)

        if lod_idx == 0:
            pidx = self.blas.query(flat, self.active_lods[0]).pidx
            feat = self._interpolate(flat, self.features[0], pidx, 0)
            return feat.reshape(*output_shape, feat.shape[-1])

        num_feats = lod_idx + 1
        q = self.blas.query(flat, self.active_lods[lod_idx], with_parents=True)
        pidx_per_level = q.pidx[..., self.base_lod:]               # [N, num_feats]
        feats = []
        for i in range(num_feats):
            feats.append(self._interpolate(flat, self.features[i],
                                           pidx_per_level[..., i], i))
        feats = jnp.concatenate(feats, axis=-1)

        if self.multiscale_type == "sum":
            feats = feats.reshape(-1, num_feats, self.feature_dim).sum(-2)
            return feats.reshape(*output_shape, self.feature_dim)
        return feats.reshape(*output_shape, self.feature_dim * num_feats)

    def raymarch(self, rays, raymarch_type, num_samples, level=None, key=None,
                 **kwargs):
        """March at base_lod — the coarsest featured level (reference octree_grid.py:221-226)."""
        return self.blas.raymarch(rays, raymarch_type=raymarch_type,
                                  num_samples=num_samples, level=self.base_lod, key=key, **kwargs)

    @classmethod
    def supported_blas(cls):
        from wisp_tpu.accelstructs import OctreeAS
        return [OctreeAS]

    def name(self) -> str:
        return "Octree Grid"

    def public_properties(self) -> Dict[str, Any]:
        props = super().public_properties()
        props.update({
            "Feature Dims": self.feature_dim,
            "Total LODs": self.max_lod,
            "Active feature LODs": [str(x) for x in self.active_lods],
            "Interpolation": self.interpolation_type,
            "Multiscale aggregation": self.multiscale_type,
        })
        return props
