"""RandomViewDataset — synthetic multiview fixture.

Counterpart of the reference's synthetic-camera smoke dataset (wisp/datasets/
random_view_dataset.py, used by tests/core/test_packed_rf_tracer.py), extended into a proper
procedural NeRF benchmark: cameras on a fibonacci sphere around a known analytic density/color
field, with ground-truth images produced by exact volumetric integration of that field. This
gives a PSNR-checkable end-to-end NeRF workload without external data (no lego on disk in this
environment; see tests/apps/test_nerf.py).
"""

from __future__ import annotations

import os
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


def lego_proxy_density_color(coords):
    """Lego-bulldozer-proxy analytic scene: high-frequency albedo + thin structures.

    Stands in for the reference's lego benchmark scene (docs/pages/app_nerf.md lego table):
    checkerboard base plate, two tracks of ~5-px-wide tread fins, a sin-noise-textured
    body, a cabin with window cutouts, a roof stud grid, rotated thin arm plates and a
    corrugated blade. Occupied fraction of the [-1,1] cube ~4% (lego-like), edge sharpness
    60-400 (vs the boxes scene's 20) so the radiance field must resolve real high
    frequencies. Returns sigma(x) [N,1] and c(x) [N,3].

    Edges use a C^1 clipped smoothstep instead of a sigmoid: GT integration evaluates this
    field ~1e10 times for a 100-view 512^2 dataset and transcendental-free edges are ~10x
    cheaper on the CPU backend (sigmoid tails also never truly reach zero, which a
    smoothstep's compact support fixes for occupancy-pruning purposes)."""
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]

    def sig(t):
        """smoothstep ramp centered at t=0 with unit width (sigmoid stand-in)."""
        u = jnp.clip(t + 0.5, 0.0, 1.0)
        return u * u * (3.0 - 2.0 * u)

    def boxind(px, py, pz, c, h, sharp=60.0):
        return (sig((1.0 - jnp.abs(px - c[0]) / h[0]) * sharp)
                * sig((1.0 - jnp.abs(py - c[1]) / h[1]) * sharp)
                * sig((1.0 - jnp.abs(pz - c[2]) / h[2]) * sharp))

    parts = []  # (indicator [N], rgb [N,3], sigma)

    # 1. base plate, checkerboard albedo (period 0.08)
    plate = boxind(x, y, z, (0.0, -0.46, 0.0), (0.62, 0.04, 0.62))
    parity = jnp.mod(jnp.floor(x / 0.08) + jnp.floor(z / 0.08), 2.0)
    cb = (parity[:, None] * jnp.asarray([0.85, 0.75, 0.20])
          + (1.0 - parity[:, None]) * jnp.asarray([0.15, 0.15, 0.18]))
    parts.append((plate, cb, 70.0))

    # 2. tread fins: two z-bands of thin (half-width 0.018) fins repeating at period 0.1
    fin = sig((0.018 - jnp.abs(jnp.mod(x + 0.55, 0.1) - 0.05)) * 400.0)
    band_y = sig((1.0 - jnp.abs(y + 0.31) / 0.11) * 80.0)
    band_x = sig((1.0 - jnp.abs(x) / 0.58) * 80.0)
    for zc in (0.40, -0.40):
        band_z = sig((1.0 - jnp.abs(z - zc) / 0.10) * 80.0)
        tread = fin * band_y * band_x * band_z
        parts.append((tread, jnp.asarray([0.25, 0.25, 0.28]), 80.0))

    # 3. body with high-frequency sin-product noise albedo
    body = boxind(x, y, z, (-0.05, -0.06, 0.0), (0.30, 0.16, 0.26))
    m = 0.55 + 0.45 * jnp.sin(40.0 * x + 1.3) * jnp.sin(33.0 * y + 0.7) * jnp.sin(47.0 * z + 2.1)
    parts.append((body, m[:, None] * jnp.asarray([0.90, 0.70, 0.10]), 60.0))

    # 4. cabin with window cutouts (perforated geometry)
    cabin = boxind(x, y, z, (-0.18, 0.22, 0.0), (0.14, 0.12, 0.16), 80.0)
    hole = boxind(x, y, z, (-0.18, 0.24, 0.0), (0.09, 0.07, 0.30), 80.0)
    parts.append((cabin * (1.0 - hole),
                  jnp.asarray([0.35, 0.40, 0.55]), 70.0))

    # 5. roof stud grid (period 0.07, radius 0.022)
    r2 = ((jnp.mod(x + 0.18 + 0.035, 0.07) - 0.035) ** 2
          + (jnp.mod(z + 0.035, 0.07) - 0.035) ** 2)
    stud = (sig((0.022 ** 2 - r2) * 4000.0)
            * sig((1.0 - jnp.abs(y - 0.36) / 0.025) * 200.0)
            * sig((1.0 - jnp.abs(x + 0.18) / 0.12) * 80.0)
            * sig((1.0 - jnp.abs(z) / 0.14) * 80.0))
    parts.append((stud, jnp.asarray([0.95, 0.80, 0.15]), 90.0))

    # 6. arm: two thin plates, rotated 0.6 rad about z around pivot (0.15, 0.05)
    ct, st = np.cos(0.6), np.sin(0.6)
    xr = ct * (x - 0.15) + st * (y - 0.05)
    yr = -st * (x - 0.15) + ct * (y - 0.05)
    for zc in (0.20, -0.20):
        arm = boxind(xr, yr, z, (0.28, 0.0, zc), (0.28, 0.03, 0.015), 100.0)
        parts.append((arm, jnp.asarray([0.75, 0.12, 0.08]), 80.0))

    # 7. blade: thin front plate with corrugated (stripe) albedo
    blade = boxind(x, y, z, (0.62, -0.28, 0.0), (0.025, 0.14, 0.30), 100.0)
    stripe = 0.5 + 0.5 * jnp.sin(120.0 * y)
    parts.append((blade, stripe[:, None] * jnp.asarray([0.80, 0.78, 0.75]), 90.0))

    # accumulate instead of stacking [N, P, 3]: halves peak memory traffic of the eval
    density = jnp.zeros((x.shape[0], 1))
    csum = jnp.zeros((x.shape[0], 3))
    for ind, rgb, sigma in parts:
        w = ind * sigma
        density = density + w[:, None]
        csum = csum + w[:, None] * rgb
    color = csum / (density + 1e-9)
    return density, color


SCENES = {"boxes": scene_density_color, "lego_proxy": lego_proxy_density_color}


def render_gt(rays: Rays, num_samples: int = 512, bg_color: float = 1.0,
              scene_fn: Callable = scene_density_color):
    """Exact volumetric rendering of the analytic scene (same integration math as
    PackedRFTracer) — [R,3] rgb + [R,1] alpha."""
    # clip integration to the scene AABB (slab test): both scenes are ~zero outside
    # |x|<0.78, so concentrating the fixed sample count inside the box roughly doubles
    # effective GT resolution (matters for the lego_proxy scene's 0.018-halfwidth fins)
    aabb = 0.78
    inv = 1.0 / jnp.where(jnp.abs(rays.dirs) < 1e-9, 1e-9, rays.dirs)
    ta = (-aabb - rays.origins) * inv
    tb = (aabb - rays.origins) * inv
    tmin = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=-1), 1.0)
    tmax = jnp.minimum(jnp.min(jnp.maximum(ta, tb), axis=-1), 5.0)
    hit = tmax > tmin
    t_near = jnp.where(hit, tmin, 1.0)
    t_far = jnp.where(hit, jnp.maximum(tmax, tmin + 1e-3), 1.0 + 1e-3)
    u = (jnp.arange(num_samples, dtype=jnp.float32) + 0.5) / num_samples
    depths = t_near[:, None] + (t_far - t_near)[:, None] * u[None]
    coords = rays.origins[:, None, :] + rays.dirs[:, None, :] * depths[..., None]
    n, s, _ = coords.shape
    density, color = scene_fn(coords.reshape(-1, 3))
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
                 dataset_path: Optional[str] = None, scene: str = "boxes",
                 gt_device: str = "host"):
        super().__init__(dataset_path=dataset_path, dataset_num_workers=dataset_num_workers,
                         transform=transform, split=split)
        if scene not in SCENES:
            raise ValueError(f"unknown scene {scene!r}; choose from {sorted(SCENES)}")
        self.scene = scene
        self.gt_device = gt_device  # "host" or "default": where GT integration runs
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

        scene_fn = SCENES[self.scene]
        render = jax.jit(lambda r: render_gt(r, self.num_gt_samples,
                                             1.0 if self.bg_color == "white" else 0.0,
                                             scene_fn))
        cache = self._gt_cache_file()
        cached = None
        if cache is not None and os.path.exists(cache):
            z = np.load(cache)
            cached = (z["rgb"], z["masks"])
        # chunk GT integration over rays: a 512^2 view at 512 samples would otherwise
        # materialize a [262144, 512, 3] coords array (1.6 GB) per view
        chunk = 32768
        cameras, all_rays, rgbs, masks = {}, [], [], []
        for i, eye in enumerate(eyes):
            up = (0.0, 1.0, 0.0) if abs(eye[1]) < 0.95 * self.radius else (1.0, 0.0, 0.0)
            cam = Camera.from_args(eye=eye, at=(0.0, 0.0, 0.0), up=up,
                                   width=self.width, height=self.height,
                                   fov=np.radians(self.fov), near=0.0, far=6.0)
            cameras[str(i)] = cam
            rays = generate_pinhole_rays(cam)
            o, d = np.asarray(rays.origins), np.asarray(rays.dirs)
            all_rays.append(Rays(origins=o, dirs=d, dist_min=0.0, dist_max=6.0))
            if cached is not None:
                rgbs.append(cached[0][i])
                masks.append(cached[1][i])
                continue
            rgb_parts, a_parts = [], []
            # gt_device="default" escapes the host pin: the 100-view 512^2 lego_proxy
            # dataset integrates ~1e10 field samples — minutes of host CPU vs seconds of
            # TPU VPU; it is one jitted call per chunk so tunnel round trips stay bounded
            gt_ctx = (_host_device_ctx() if self.gt_device == "host"
                      else jax.default_device(jax.devices()[0]))
            # accelerator chunk sized so coords + ~6 live [N*S] part indicators stay
            # well under 16 GB HBM at 512 GT samples
            gt_chunk = chunk if self.gt_device == "host" else 131072
            with gt_ctx:
                for s in range(0, o.shape[0], gt_chunk):
                    rgb_c, a_c = render(Rays(origins=jnp.asarray(o[s:s + gt_chunk]),
                                             dirs=jnp.asarray(d[s:s + gt_chunk]),
                                             dist_min=0.0, dist_max=6.0))
                    rgb_parts.append(np.asarray(rgb_c))
                    a_parts.append(np.asarray(a_c))
            rgbs.append(np.concatenate(rgb_parts))
            masks.append(np.concatenate(a_parts) > 0.5)
        if cache is not None and cached is None:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            np.savez_compressed(cache, rgb=np.stack(rgbs), masks=np.stack(masks))
        self._cameras = cameras
        return {"rays": all_rays, "rgb": rgbs, "masks": masks}

    def _gt_cache_file(self):
        """GT-render disk cache: `dataset_path`, normally unused for a procedural dataset,
        names a cache directory (integrating 100 views at 512^2 costs minutes of host CPU;
        the camera/ray side is cheap and always regenerated)."""
        if self.dataset_path is None:
            return None
        key = (f"rv_{self.scene}_{self.split}_{self.num_views}v_{self.width}x{self.height}"
               f"_s{self.num_gt_samples}_f{self.fov:g}_r{self.radius:g}_{self.bg_color}")
        return os.path.join(self.dataset_path, key + ".npz")

    def create_split(self, split: str, transform=None) -> "RandomViewDataset":
        # propagate the GT cache dir and integration device: the cache key includes the
        # split/num_views/res, so the val split caches alongside train (a 512^2 7-view
        # host-side integration otherwise re-runs ~5 min on every app start)
        return RandomViewDataset(num_views=min(self.num_views, 7), height=self.height,
                                 width=self.width, split=split, fov=self.fov,
                                 radius=self.radius, num_gt_samples=self.num_gt_samples,
                                 bg_color=self.bg_color, transform=transform,
                                 scene=self.scene, dataset_path=self.dataset_path,
                                 gt_device=self.gt_device)

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
            density, _ = jax.jit(SCENES[self.scene])(jnp.asarray(pts))
            keep = np.asarray(density[:, 0]) > threshold
        return pts[keep][:num_points]

    def public_properties(self) -> dict:
        return {"Views": self.num_views, "Resolution": f"{self.width}x{self.height}",
                "Scene": f"procedural {self.scene}"}
