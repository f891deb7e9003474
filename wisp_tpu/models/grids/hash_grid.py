"""HashGrid — instant-ngp style multiresolution hash feature grid.

Counterpart of reference wisp/models/grids/hash_grid.py:20-265. Features live in a single flat
MultiTable parameter; interpolation runs through wisp_tpu.ops.grid.hashgrid (gather + blend
fused by XLA; the reference used one CUDA launch per LOD with atomicAdd backward).

Reference quirks replicated exactly:
* the kernel computes ALL LODs regardless of lod_idx (reference ops/grid.py:91 "TODO ... use
  the LOD"); 'cat' then zeroes features from column lod_idx*feature_dim on
  (hash_grid.py:226-229), 'sum' reduces over all LODs (hash_grid.py:230-231).
* per-LOD table size = min(res^d, 2^bitwidth) with dense indexing when the level fits.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.models.grids.blas_grid import BLASGrid
from wisp_tpu.models.grids.utils import MultiTable
from wisp_tpu.ops import grid as grid_ops


class HashGrid(BLASGrid):
    def __init__(self,
                 blas=None,
                 feature_dim: int = 2,
                 resolutions: Sequence[int] = (16, 32, 64, 128),
                 multiscale_type: str = "sum",
                 feature_std: float = 0.0,
                 feature_bias: float = 0.0,
                 codebook_bitwidth: int = 8,
                 coord_dim: int = 3,
                 dense_lod_matmul: Optional[str] = None,
                 stoch_grad: bool = False,
                 *,
                 key=None):
        assert coord_dim in (2, 3)
        assert dense_lod_matmul in (None, "bf16", "f32", "f32_highest")
        self.blas = blas
        self.feature_dim = feature_dim
        self.multiscale_type = multiscale_type
        self.feature_std = feature_std
        self.feature_bias = feature_bias
        self.codebook_bitwidth = codebook_bitwidth
        self.codebook_size = 2 ** codebook_bitwidth
        self.coord_dim = coord_dim
        # TPU fast path: dense-table LODs interpolate via one MXU matmul (ops/grid.py
        # _lod_features_dense_matmul) instead of 8 gathers + 8 backward scatters.
        self.dense_lod_matmul = dense_lod_matmul
        # TPU fast path: hash-LOD backward scatters ONE corner per sample (drawn with
        # prob = its trilinear weight — unbiased; ops/grid.py interp_rows_stoch). Cuts
        # the dominant backward scatter-index count 8x. PSNR-gated.
        self.stoch_grad = stoch_grad

        self.frozen = False
        self.resolutions = tuple(int(r) for r in resolutions)
        self.num_lods = len(self.resolutions)
        self.active_lods = tuple(range(self.num_lods))
        self.max_lod = self.num_lods - 1

        if key is None:
            key = jax.random.PRNGKey(0)
        self.codebook = MultiTable(self.resolutions, coord_dim, feature_dim,
                                   std=feature_std, max_feats=self.codebook_size,
                                   mean=feature_bias, key=key)

        # Occupancy tracking for pruning (reference hash_grid.py:63-68): dense cell centers at
        # the BLAS's max level + a decaying occupancy score per cell.
        if blas is not None and hasattr(blas, "max_level"):
            self.occupancy = jnp.zeros((blas.num_cells_at_max_level(),), jnp.float32)
        else:
            self.occupancy = None

    # -- constructors (reference hash_grid.py:88-192) ----------------------------------------
    @classmethod
    def from_octree(cls, blas=None, feature_dim: int = 2, base_lod: int = 2,
                    num_lods: int = 1, multiscale_type: str = "sum",
                    feature_std: float = 0.0, feature_bias: float = 0.0,
                    codebook_bitwidth: int = 8, coord_dim: int = 3,
                    dense_lod_matmul: Optional[str] = None, stoch_grad: bool = False,
                    *, key=None) -> "HashGrid":
        """Octree sampling pattern: resolutions 2^(base_lod) .. 2^(base_lod+num_lods-1)."""
        octree_lods = [base_lod + x for x in range(num_lods)]
        resolutions = [2 ** lod for lod in octree_lods]
        return cls(blas=blas, feature_dim=feature_dim, resolutions=resolutions,
                   multiscale_type=multiscale_type, feature_std=feature_std,
                   feature_bias=feature_bias, codebook_bitwidth=codebook_bitwidth,
                   coord_dim=coord_dim, dense_lod_matmul=dense_lod_matmul,
                   stoch_grad=stoch_grad, key=key)

    @classmethod
    def from_geometric(cls, blas=None, feature_dim: int = 2, num_lods: int = 16,
                       multiscale_type: str = "sum", feature_std: float = 0.0,
                       feature_bias: float = 0.0, codebook_bitwidth: int = 8,
                       min_grid_res: int = 16, max_grid_res: int = 2048,
                       coord_dim: int = 3, dense_lod_matmul: Optional[str] = None,
                       stoch_grad: bool = False,
                       *, key=None) -> "HashGrid":
        """Geometric b-growth per instant-ngp Section 3 eq. 2-3
        (reference hash_grid.py:124-162)."""
        b = np.exp((np.log(max_grid_res) - np.log(min_grid_res)) / (num_lods - 1))
        resolutions = [int(np.floor(min_grid_res * (b ** l))) for l in range(num_lods)]
        return cls(blas=blas, feature_dim=feature_dim, resolutions=resolutions,
                   multiscale_type=multiscale_type, feature_std=feature_std,
                   feature_bias=feature_bias, codebook_bitwidth=codebook_bitwidth,
                   coord_dim=coord_dim, dense_lod_matmul=dense_lod_matmul,
                   stoch_grad=stoch_grad, key=key)

    @classmethod
    def from_resolutions(cls, blas=None, feature_dim: int = 2,
                         resolutions: Optional[Sequence[int]] = None,
                         multiscale_type: str = "sum", feature_std: float = 0.0,
                         feature_bias: float = 0.0, codebook_bitwidth: int = 8,
                         coord_dim: int = 3, *, key=None) -> "HashGrid":
        assert resolutions is not None, \
            "HashGrid.from_resolutions() cannot accept a None resolutions arg."
        return cls(blas=blas, feature_dim=feature_dim, resolutions=resolutions,
                   multiscale_type=multiscale_type, feature_std=feature_std,
                   feature_bias=feature_bias, codebook_bitwidth=codebook_bitwidth,
                   coord_dim=coord_dim, key=key)

    def freeze(self) -> "HashGrid":
        """Feature grid stops receiving gradients (reference hash_grid.py:195-198
        requires_grad_(False); functional form: stop_gradient in interpolate)."""
        return self.replace(frozen=True)

    # HashGrid.interpolate accepts max_compute_lod (LOD-truncation fast path)
    SUPPORTS_COMPUTE_CAP = True

    # -- feature lookup (reference hash_grid.py:205-233) --------------------------------------
    def interpolate(self, coords, lod_idx, max_compute_lod: Optional[int] = None):
        """Multiscale feature lookup. ``max_compute_lod`` (static int) caps how many LODs
        are actually computed — LODs above it yield zero features. Two uses:
        (1) spacing-based LOD truncation (PackedRFTracer lod_spacing_scale): LODs whose
        cells are finer than the ray sampling step alias anyway; (2) when lod_idx is a
        static int under 'cat', LODs >= lod_idx are ALWAYS zeroed by the reference's own
        column mask (hash_grid.py:226-229), so computing them is pure waste — they are
        skipped automatically with identical output."""
        output_shape = coords.shape[:-1]
        flat = coords.reshape(-1, coords.shape[-1])
        table = self.codebook.feats
        if self.frozen:
            table = jnp.asarray(jax.lax.stop_gradient(table))

        num_compute = self.num_lods  # reference quirk: kernel computes all LODs
        if self.multiscale_type == "cat" and isinstance(lod_idx, (int, np.integer)):
            # columns >= lod_idx*F get zeroed below; skip computing those LODs
            num_compute = min(num_compute, int(lod_idx))
        if max_compute_lod is not None:
            num_compute = min(num_compute, int(max_compute_lod) + 1)

        width = self.num_lods * self.feature_dim
        if num_compute <= 0:
            feats = jnp.zeros((flat.shape[0], width), table.dtype)
        else:
            feats = grid_ops.hashgrid(
                flat, self.codebook.resolutions, self.codebook_bitwidth,
                num_compute - 1,
                table, self.codebook.begin_idxes, self.codebook.num_feats,
                dense_matmul=self.dense_lod_matmul, stoch_grad=self.stoch_grad)
            if num_compute < self.num_lods:
                feats = jnp.pad(feats, ((0, 0), (0, width - feats.shape[-1])))

        if self.multiscale_type == "cat":
            feats = feats.reshape(*output_shape, width)
            # lod_idx may be a traced scalar (random_lod training, reference
            # multiview_trainer.py:127-132) — the column mask works either way
            mask = (jnp.arange(self.num_lods * self.feature_dim)
                    < lod_idx * self.feature_dim)
            return feats * mask.astype(feats.dtype)
        elif self.multiscale_type == "sum":
            return feats.reshape(*output_shape, self.num_lods,
                                 self.feature_dim).sum(-2)
        raise NotImplementedError(self.multiscale_type)

    def raymarch(self, rays, raymarch_type, num_samples, level=None, key=None,
                 **kwargs):
        """Raymarch over the BLAS's finest level (reference hash_grid.py:235-240)."""
        return self.blas.raymarch(rays, raymarch_type=raymarch_type,
                                  num_samples=num_samples, level=self.blas.max_level,
                                  key=key, **kwargs)

    @classmethod
    def supported_blas(cls):
        from wisp_tpu.accelstructs import OctreeAS, AxisAlignedBBoxAS
        return [OctreeAS, AxisAlignedBBoxAS]

    def name(self) -> str:
        return "Hash Grid"

    def public_properties(self) -> Dict[str, Any]:
        props = super().public_properties()
        props.update({
            "Feature Dims": self.feature_dim,
            "Total LODs": self.max_lod,
            "Active feature LODs": f"{self.active_lods[0]} - {self.active_lods[-1]}",
            "Interpolation": "linear",
            "Multiscale aggregation": self.multiscale_type,
            "HashTable Size": f"2^{self.codebook_bitwidth}",
        })
        return props
