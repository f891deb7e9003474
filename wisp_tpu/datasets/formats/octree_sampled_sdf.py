"""OctreeSampledSDFDataset — SDF samples restricted to occupied octree cells.

Counterpart of reference wisp/datasets/formats/octree_sdf_dataset.py:92-218: samples
``samples_per_voxel`` uniform points per occupied leaf cell plus near-surface/surface
samples, filters to the narrowband via blas.query, and computes exact mesh SDF ground truth.
Requires a blas built from a mesh (carries the mesh in blas.extent — reference
supports_blas, :76)."""

from __future__ import annotations

import logging
from typing import Callable, List, Optional

import numpy as np

from wisp_tpu.datasets.base_datasets import SDFDataset
from wisp_tpu.datasets.batch import SDFBatch

log = logging.getLogger(__name__)


class OctreeSampledSDFDataset(SDFDataset):
    def __init__(self, split: Optional[str] = None,
                 transform: Optional[Callable] = None,
                 sample_mode: Optional[List[str]] = None,
                 num_samples: int = 100000,
                 samples_per_voxel: int = 32,
                 blas=None,
                 seed: int = 0,
                 dataset_path: Optional[str] = None):
        super().__init__(dataset_path=dataset_path, transform=transform, split=split)
        assert blas is not None and getattr(blas, "extent", None) is not None, \
            "OctreeSampledSDFDataset requires a blas built with OctreeAS.from_mesh"
        self.blas = blas
        self.sample_mode = list(sample_mode) if sample_mode is not None \
            else ["near", "trace"]
        self.num_samples = num_samples
        self.samples_per_voxel = samples_per_voxel
        self._rng = np.random.default_rng(seed)
        self.resample()

    @staticmethod
    def supports_blas(blas) -> bool:
        """Mirrors reference octree_sdf_dataset.py:76."""
        return getattr(blas, "extent", None) is not None

    def resample(self) -> None:
        import jax.numpy as jnp
        from wisp_tpu.ops.mesh import compute_sdf, point_sample
        from wisp_tpu.ops.spc import sample_spc

        vertices = self.blas.extent.vertices
        faces = self.blas.extent.faces

        # uniform samples inside occupied voxels (reference :92-118)
        leaf_points = np.asarray(self.blas.points[self.blas.max_level])
        voxel_samples = sample_spc(leaf_points, self.blas.max_level,
                                   self.samples_per_voxel, rng=self._rng)
        # surface / near-surface samples
        samples_per_mode = self.num_samples // max(len(self.sample_mode), 1)
        surf = point_sample(vertices, faces, self.sample_mode, samples_per_mode,
                            rng=self._rng)
        pts = np.concatenate([voxel_samples, surf]).astype(np.float32)

        # narrowband filter: keep only points inside occupied cells (reference :133-150)
        occ = np.asarray(self.blas.query(jnp.asarray(pts)).pidx) > -1
        pts = pts[occ]

        sdf = compute_sdf(vertices, faces, pts)
        self.coords_data = pts
        self.sdf_data = sdf[:, None]
        log.info(f"resampled {len(pts)} narrowband sdf points")

    @property
    def coordinates(self) -> np.ndarray:
        return self.coords_data

    def __len__(self):
        return len(self.coords_data)

    def __getitem__(self, idx):
        batch = SDFBatch(coords=self.coords_data[idx], sdf=self.sdf_data[idx])
        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    def public_properties(self) -> dict:
        return {"Samples": len(self.coords_data),
                "Samples per voxel": self.samples_per_voxel,
                "Sample modes": self.sample_mode}
