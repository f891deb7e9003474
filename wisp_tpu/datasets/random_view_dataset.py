"""RandomViewDataset — synthetic multiview fixture.

Counterpart of the reference's synthetic-camera smoke dataset (wisp/datasets/
random_view_dataset.py, used by tests/core/test_packed_rf_tracer.py), extended into a proper
procedural NeRF benchmark: cameras on a fibonacci sphere around a known analytic density/color
field, with ground-truth images produced by exact volumetric integration of that field. This
gives a PSNR-checkable end-to-end NeRF workload without external data (no lego on disk in this
environment; see tests/apps/test_nerf.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.rays import Rays
from wisp_tpu.datasets.base_datasets import MultiviewDataset
from wisp_tpu.datasets.batch import MultiviewBatch
from wisp_tpu.ops.geometric import sample_fib_sphere
from wisp_tpu.ops.raygen.raygen import generate_pinhole_rays

# Procedural scene: soft axis-aligned boxes, each (center, half-extent, color, density).
_SCENE_BOXES = np.asarray([
    # cx,   cy,   cz,   hx,   hy,   hz,   r,   g,   b,   sigma
    [0.0,  -0.3,  0.0,  0.45, 0.15, 0.45, 0.9, 0.2, 0.1, 40.0],   # red slab
    [0.0,   0.1,  0.0,  0.25, 0.25, 0.25, 0.1, 0.8, 0.2, 30.0],   # green cube
    [0.25,  0.45, 0.25, 0.12, 0.12, 0.12, 0.2, 0.3, 0.9, 60.0],   # blue block
    [-0.3,  0.35, -0.2, 0.10, 0.20, 0.10, 0.9, 0.8, 0.1, 50.0],   # yellow pillar
], dtype=np.float32)


def scene_density_color(coords):
    """Analytic sigma(x) [N,1] and c(x) [N,3] of the procedural scene (soft box edges)."""
    centers = jnp.asarray(_SCENE_BOXES[:, 0:3])
    half = jnp.asarray(_SCENE_BOXES[:, 3:6])
    colors = jnp.asarray(_SCENE_BOXES[:, 6:9])
    sigmas = jnp.asarray(_SCENE_BOXES[:, 9])

    d = jnp.abs(coords[:, None, :] - centers[None]) / half[None]   # [N, B, 3]
    # soft indicator: 1 well inside, 0 outside, smooth edge
    inside = jnp.prod(jax.nn.sigmoid((1.0 - d) * 20.0), axis=-1)   # [N, B]
    density = jnp.sum(inside * sigmas[None], axis=-1, keepdims=True)
    w = inside * sigmas[None] + 1e-9
    color = (w[..., None] * colors[None]).sum(axis=1) / w.sum(axis=-1, keepdims=True)
    return density, color


def render_gt(rays: Rays, num_samples: int = 512, bg_color: float = 1.0):
    """Exact volumetric rendering of the analytic scene (same integration math as
    PackedRFTracer) — [R,3] rgb + [R,1] alpha."""
    t_near = jnp.full(rays.origins.shape[:1], 1.0)
    t_far = jnp.full(rays.origins.shape[:1], 5.0)
    u = (jnp.arange(num_samples, dtype=jnp.float32) + 0.5) / num_samples
    depths = t_near[:, None] + (t_far - t_near)[:, None] * u[None]
    coords = rays.origins[:, None, :] + rays.dirs[:, None, :] * depths[..., None]
    n, s, _ = coords.shape
    density, color = scene_density_color(coords.reshape(-1, 3))
    density = density.reshape(n, s)
    color = color.reshape(n, s, 3)
    deltas = (t_far - t_near)[:, None] / num_samples
    tau = density * deltas
    sum_prev = jnp.cumsum(tau, axis=-1) - tau
    weights = jnp.exp(-sum_prev) * (1.0 - jnp.exp(-tau))
    alpha = weights.sum(-1, keepdims=True)
    rgb = (weights[..., None] * color).sum(1) + bg_color * (1.0 - alpha)
    return rgb, alpha


from wisp_tpu.datasets.utils import host_device_ctx as _host_device_ctx


class RandomViewDataset(MultiviewDataset):
    def __init__(self, num_views: int = 25, height: int = 128, width: int = 128,
                 split: str = "train", fov: float = 30.0, radius: float = 3.2,
                 num_gt_samples: int = 512, bg_color: str = "white",
                 dataset_num_workers: int = -1, transform: Optional[Callable] = None,
                 dataset_path: Optional[str] = None):
        super().__init__(dataset_path=dataset_path, dataset_num_workers=dataset_num_workers,
                         transform=transform, split=split)
        self.num_views = num_views
        self.height = height
        self.width = width
        self.fov = fov
        self.radius = radius
        self.bg_color = bg_color
        self.num_gt_samples = num_gt_samples
        self.data = self.load()

    def load_singleprocess(self):
        # Pin generation to the host CPU backend: camera construction + raygen are a chain
        # of small eager ops, and on the remote-TPU platform each eager dispatch costs a
        # 1-6 s tunnel round trip (CLAUDE.md) — 25 views of setup took minutes. The outputs
        # are host numpy arrays either way; trainers re-stage them onto the TPU.
        with _host_device_ctx():
            return self._load_on_host()

    def _load_on_host(self):
        # validation split uses rotated view directions so train/test views differ
        eyes = sample_fib_sphere(self.num_views + (7 if self.split != "train" else 0))
        if self.split != "train":
            eyes = eyes[-self.num_views:]
        eyes = eyes * self.radius

        render = jax.jit(lambda r: render_gt(r, self.num_gt_samples,
                                             1.0 if self.bg_color == "white" else 0.0))
        cameras, all_rays, rgbs, masks = {}, [], [], []
        for i, eye in enumerate(eyes):
            up = (0.0, 1.0, 0.0) if abs(eye[1]) < 0.95 * self.radius else (1.0, 0.0, 0.0)
            cam = Camera.from_args(eye=eye, at=(0.0, 0.0, 0.0), up=up,
                                   width=self.width, height=self.height,
                                   fov=np.radians(self.fov), near=0.0, far=6.0)
            cameras[str(i)] = cam
            rays = generate_pinhole_rays(cam)
            rgb, alpha = render(rays)
            all_rays.append(Rays(origins=np.asarray(rays.origins),
                                 dirs=np.asarray(rays.dirs), dist_min=0.0, dist_max=6.0))
            rgbs.append(np.asarray(rgb))
            masks.append(np.asarray(alpha) > 0.5)
        self._cameras = cameras
        return {"rays": all_rays, "rgb": rgbs, "masks": masks}

    def create_split(self, split: str, transform=None) -> "RandomViewDataset":
        return RandomViewDataset(num_views=min(self.num_views, 7), height=self.height,
                                 width=self.width, split=split, fov=self.fov,
                                 radius=self.radius, num_gt_samples=self.num_gt_samples,
                                 bg_color=self.bg_color, transform=transform)

    def __len__(self):
        return len(self.data["rays"])

    def __getitem__(self, idx: int) -> MultiviewBatch:
        batch = MultiviewBatch(rays=self.data["rays"][idx], rgb=self.data["rgb"][idx],
                               masks=self.data["masks"][idx])
        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    @property
    def img_shape(self):
        return (self.height, self.width)

    @property
    def num_images(self):
        return len(self.data["rays"])

    @property
    def cameras(self):
        return self._cameras

    def scene_pointcloud(self, num_points: int = 200000, threshold: float = 1.0
                         ) -> np.ndarray:
        """Points inside the analytic scene's occupied region — lets apps build a sparse
        acceleration structure for this dataset (the RTMV depth-pointcloud analog)."""
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1.0, 1.0, (num_points * 4, 3)).astype(np.float32)
        with _host_device_ctx():
            density, _ = jax.jit(scene_density_color)(jnp.asarray(pts))
            keep = np.asarray(density[:, 0]) > threshold
        return pts[keep][:num_points]

    def public_properties(self) -> dict:
        return {"Views": self.num_views, "Resolution": f"{self.width}x{self.height}",
                "Scene": "procedural boxes"}
