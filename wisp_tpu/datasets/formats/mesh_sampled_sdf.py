"""MeshSampledSDFDataset — SDF samples drawn directly from a mesh.

Counterpart of reference wisp/datasets/formats/mesh_sdf_dataset.py:23-212: load + normalize
an OBJ, sample per ``sample_mode`` (rand/near/trace combinations), compute exact SDF ground
truth (mesh2sdf equivalent), optionally resample online between epochs.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional

import numpy as np

from wisp_tpu.datasets.base_datasets import SDFDataset
from wisp_tpu.datasets.batch import SDFBatch

log = logging.getLogger(__name__)


class MeshSampledSDFDataset(SDFDataset):
    def __init__(self, dataset_path: Optional[str] = None,
                 split: Optional[str] = None,
                 transform: Optional[Callable] = None,
                 sample_mode: Optional[List[str]] = None,
                 num_samples: int = 100000,
                 sample_tex: bool = False,
                 mode_norm: str = "sphere",
                 vertices: Optional[np.ndarray] = None,
                 faces: Optional[np.ndarray] = None,
                 seed: int = 0):
        """Either ``dataset_path`` (an .obj) or explicit (vertices, faces) must be given —
        the latter supports procedural test meshes."""
        super().__init__(dataset_path=dataset_path, transform=transform, split=split)
        from wisp_tpu.ops.mesh import load_obj, normalize
        self.sample_mode = list(sample_mode) if sample_mode is not None \
            else ["rand", "near", "near", "trace", "trace"]
        self.num_samples = num_samples
        self.sample_tex = sample_tex
        self.mode_norm = mode_norm
        self._rng = np.random.default_rng(seed)

        if vertices is None:
            out = load_obj(dataset_path)
            vertices, faces = out[0], out[1]
        self.vertices, self.faces = normalize(vertices, faces, mode_norm)
        self.resample()

    @classmethod
    def is_root_of_dataset(cls, root: str, files_list: List[str]) -> bool:
        return root.endswith(".obj")

    def resample(self) -> None:
        """Draw a fresh sample set + GT SDF (reference mesh_sdf_dataset.py resample)."""
        from wisp_tpu.ops.mesh import point_sample, compute_sdf
        samples_per_mode = self.num_samples // max(len(self.sample_mode), 1)
        pts = point_sample(self.vertices, self.faces, self.sample_mode,
                           samples_per_mode, rng=self._rng)
        sdf = compute_sdf(self.vertices, self.faces, pts)
        self.coords_data = pts
        self.sdf_data = sdf[:, None]
        log.info(f"resampled {len(pts)} sdf points")

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
        return {"Mesh": self.dataset_path or "procedural",
                "Samples": len(self.coords_data),
                "Sample modes": self.sample_mode}
