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
                 get_normals: bool = False,
                 sample_tex: bool = False,
                 mode_norm: str = "sphere",
                 vertices: Optional[np.ndarray] = None,
                 faces: Optional[np.ndarray] = None,
                 texv: Optional[np.ndarray] = None,
                 texf: Optional[np.ndarray] = None,
                 materials: Optional[list] = None,
                 face_mats: Optional[np.ndarray] = None,
                 seed: int = 0):
        """Either ``dataset_path`` (an .obj) or explicit (vertices, faces) must be given —
        the latter supports procedural test meshes (optionally with texv/texf/materials/
        face_mats for sample_tex).

        ``get_normals``: batches carry the surface normal per sample; sampling switches to
        all-surface samples (reference mesh_sdf_dataset.py:191-195 does the same).
        ``sample_tex``: batches carry the closest-surface-point texture color per sample
        (reference mesh_sdf_dataset.py:197-205 via closest_tex); requires a materialed
        mesh (.obj with mtllib, or explicit material args)."""
        super().__init__(dataset_path=dataset_path, transform=transform, split=split)
        from wisp_tpu.ops.mesh import load_obj, normalize
        self.sample_mode = list(sample_mode) if sample_mode is not None \
            else ["rand", "near", "near", "trace", "trace"]
        self.num_samples = num_samples
        self.get_normals = get_normals
        self.sample_tex = sample_tex
        self.mode_norm = mode_norm
        self._rng = np.random.default_rng(seed)

        self.texv = texv
        self.texf = texf
        self.materials = materials
        self.face_mats = face_mats
        if vertices is None:
            if sample_tex:
                vertices, faces, self.texv, self.texf, self.face_mats, \
                    self.materials = load_obj(dataset_path, load_materials=True)
            else:
                vertices, faces = load_obj(dataset_path)
        if sample_tex and (self.materials is None or len(self.materials) == 0):
            raise ValueError("sample_tex=True requires a materialed mesh "
                             "(.obj with mtllib/usemtl, or explicit materials=)")
        self.vertices, self.faces = normalize(vertices, faces, mode_norm)
        self.resample()

    @classmethod
    def is_root_of_dataset(cls, root: str, files_list: List[str]) -> bool:
        return root.endswith(".obj")

    def resample(self) -> None:
        """Draw a fresh sample set + GT SDF [+ normals, + texture rgb]
        (reference mesh_sdf_dataset.py:185-210 resample)."""
        from wisp_tpu.ops.mesh import point_sample, compute_sdf, sample_surface
        samples_per_mode = self.num_samples // max(len(self.sample_mode), 1)
        self.normals_data = None
        self.rgb_data = None
        if self.get_normals:
            # reference behavior: normals require on-surface samples, so the whole set is
            # surface-sampled (mesh_sdf_dataset.py:193-195)
            pts, nrm = sample_surface(self.vertices, self.faces,
                                      samples_per_mode * len(self.sample_mode),
                                      rng=self._rng, return_normals=True)
            self.normals_data = nrm
        else:
            pts = point_sample(self.vertices, self.faces, self.sample_mode,
                               samples_per_mode, rng=self._rng)
        sdf = compute_sdf(self.vertices, self.faces, pts)
        if self.sample_tex:
            # closest-surface-point texture color (reference mesh_sdf_dataset.py:197-198;
            # the signed distance still comes from compute_sdf's pseudonormal vote — the
            # reference reuses its kernel's unsigned distance here, which loses the sign
            # for interior samples; keeping the signed GT is strictly more faithful to the
            # training objective)
            from wisp_tpu.ops.mesh.closest_tex import closest_tex
            rgb, _, _ = closest_tex(self.vertices, self.faces, self.texv, self.texf,
                                    self.materials, self.face_mats, pts)
            self.rgb_data = rgb
        self.coords_data = pts
        self.sdf_data = sdf[:, None]
        log.info(f"resampled {len(pts)} sdf points"
                 + (" (+rgb)" if self.rgb_data is not None else "")
                 + (" (+normals)" if self.normals_data is not None else ""))

    @property
    def coordinates(self) -> np.ndarray:
        return self.coords_data

    def __len__(self):
        return len(self.coords_data)

    def __getitem__(self, idx):
        batch = SDFBatch(coords=self.coords_data[idx], sdf=self.sdf_data[idx])
        if self.rgb_data is not None:
            batch["rgb"] = self.rgb_data[idx]
        if self.normals_data is not None:
            batch["normals"] = self.normals_data[idx]
        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    def public_properties(self) -> dict:
        return {"Mesh": self.dataset_path or "procedural",
                "Samples": len(self.coords_data),
                "Sample modes": self.sample_mode,
                "Textured": self.sample_tex, "Normals": self.get_normals}
