"""Camera — extrinsics + pinhole/ortho intrinsics.

TPU-native equivalent of the kaolin Camera surface the reference leans on
(SURVEY.md §2.2: kaolin.render.camera.Camera + blender_coords + intrinsics classes, used by
datasets/formats/nerf_standard_dataset.py:22,413-423 and ops/raygen). Host-side numpy matrices
(cameras are tiny; ray generation is jnp).

Conventions: extrinsics store the world→camera view matrix; the camera looks down -Z with +Y
up in camera space (OpenGL), matching the reference's blender_coords() handling of the
nerf-synthetic format.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Camera:
    view_matrix: np.ndarray           # [4,4] world -> camera
    width: int = 800
    height: int = 800
    fov: Optional[float] = None       # horizontal fov in RADIANS (pinhole)
    focal_x: Optional[float] = None
    focal_y: Optional[float] = None
    x0: float = 0.0                   # principal point offset from center (pixels)
    y0: float = 0.0
    near: float = 1e-2
    far: float = 1e2
    lens: str = "pinhole"             # 'pinhole' | 'ortho'
    fov_distance: float = 1.0         # ortho half-extent

    def __post_init__(self):
        self.view_matrix = np.asarray(self.view_matrix, dtype=np.float32).reshape(4, 4)
        if self.lens == "pinhole":
            if self.focal_x is None:
                assert self.fov is not None, "pinhole camera needs fov or focal length"
                self.focal_x = 0.5 * self.width / np.tan(0.5 * self.fov)
            if self.focal_y is None:
                self.focal_y = self.focal_x
            if self.fov is None:
                self.fov = 2.0 * np.arctan(0.5 * self.width / self.focal_x)

    # -- constructors ------------------------------------------------------------------------
    @classmethod
    def from_args(cls, eye=None, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
                  view_matrix=None, width=800, height=800, fov=None, focal_x=None,
                  focal_y=None, x0=0.0, y0=0.0, near=1e-2, far=1e2,
                  lens="pinhole", fov_distance=1.0) -> "Camera":
        """Mirror of kaolin Camera.from_args: lookat or explicit view matrix."""
        if view_matrix is None:
            from wisp_tpu.ops.geometric import look_at
            view_matrix = look_at(eye, at, up)
        return cls(view_matrix=view_matrix, width=width, height=height, fov=fov,
                   focal_x=focal_x, focal_y=focal_y, x0=x0, y0=y0, near=near, far=far,
                   lens=lens, fov_distance=fov_distance)

    @classmethod
    def from_cam_to_world(cls, cam_to_world: np.ndarray, **kwargs) -> "Camera":
        """From a camera→world matrix (e.g. nerf-synthetic transform_matrix, OpenGL
        convention)."""
        c2w = np.asarray(cam_to_world, dtype=np.float32).reshape(4, 4)
        return cls(view_matrix=np.linalg.inv(c2w), **kwargs)

    # -- accessors ---------------------------------------------------------------------------
    @property
    def cam_to_world(self) -> np.ndarray:
        return np.linalg.inv(self.view_matrix)

    @property
    def cam_pos(self) -> np.ndarray:
        return self.cam_to_world[:3, 3]

    @property
    def right(self) -> np.ndarray:
        return self.cam_to_world[:3, 0]

    @property
    def up(self) -> np.ndarray:
        return self.cam_to_world[:3, 1]

    @property
    def forward(self) -> np.ndarray:
        return -self.cam_to_world[:3, 2]  # camera looks down -Z

    def resize(self, width: int, height: int) -> "Camera":
        """Rescaled camera keeping the fov (focal scales with width)."""
        scale = width / self.width
        return dataclasses.replace(
            self, width=width, height=height,
            focal_x=self.focal_x * scale if self.focal_x else None,
            focal_y=self.focal_y * (height / self.height) if self.focal_y else None,
            x0=self.x0 * scale, y0=self.y0 * (height / self.height))

    def translate(self, t) -> "Camera":
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = -np.asarray(t, dtype=np.float32)
        return dataclasses.replace(self, view_matrix=self.view_matrix @ m)

    def change_coordinate_system(self, basis: np.ndarray) -> "Camera":
        """Re-express the world in a new orthonormal basis (kaolin
        CameraExtrinsics.change_coordinate_system semantics: view' = view @ basis_hom).
        Used by dataset loaders to convert blender Z-up worlds to the renderer's Y-up
        convention (reference nerf_standard_dataset.py:423, rtmv_dataset.py:479)."""
        b = np.eye(4, dtype=np.float32)
        b[:3, :3] = np.asarray(basis, dtype=np.float32)
        return dataclasses.replace(self, view_matrix=self.view_matrix @ b)


def blender_coords() -> np.ndarray:
    """Basis change from blender's Z-up world to the Y-up render convention
    (kaolin.render.camera.blender_coords equivalent)."""
    return np.array([[1.0, 0.0, 0.0],
                     [0.0, 0.0, -1.0],
                     [0.0, 1.0, 0.0]], dtype=np.float32)
