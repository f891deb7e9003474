"""OfflineRenderer — headless snapshot renderer.

Counterpart of reference wisp/trainers/tracker/offline_renderer.py:23-329: lookat ray
generation, batched pipeline rendering into a RenderBuffer, normal/matcap shading modes,
360° orbits, and SDF cross-section slices for logging/validation.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.rays import Rays
from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.ops.raygen.raygen import generate_pinhole_rays

log = logging.getLogger(__name__)


class OfflineRenderer:
    # Default rays-per-trace chunk. render_batch=0 (trace ALL rays in one jit call) OOMs on
    # TPU at snapshot resolutions: 512^2 rays x 512 steps of [N, 2] interval buffers pad
    # 64x under the (8,128) tile layout (2 lanes -> 128) = 137 GB HBM. 16k rays x 512 steps
    # keeps every per-sample intermediate < 1 GB padded.
    DEFAULT_RENDER_BATCH = 2 ** 14

    def __init__(self, render_res: Tuple[int, int] = (1024, 1024), render_batch: int = -1,
                 shading_mode: str = "rb", matcap_path: Optional[str] = None,
                 shadow: bool = False, ao: bool = False, perf: bool = False):
        self.width, self.height = render_res
        self.render_batch = self.DEFAULT_RENDER_BATCH if render_batch < 0 else render_batch
        self.shading_mode = shading_mode
        self.matcap_path = matcap_path
        self.shadow = shadow
        self.ao = ao
        self._infer = None

    # -- core render (reference offline_renderer.py:92-200) ------------------------------------
    def render(self, pipeline, rays: Rays, lod_idx: Optional[int] = None) -> RenderBuffer:
        """Batched trace of a ray pack through the pipeline, with optional shading
        (reference offline_renderer.py:92-200 applies normal/matcap + shadow shaders)."""
        if self._infer is None:
            self._infer = jax.jit(
                lambda p, r: p(rays=r), static_argnames=())
        n = rays.origins.shape[0]
        chunk = self.render_batch if self.render_batch > 0 else n
        origins, dirs = np.asarray(rays.origins), np.asarray(rays.dirs)
        outs = []
        for i in range(0, n, chunk):
            o, d = origins[i:i + chunk], dirs[i:i + chunk]
            pad = chunk - o.shape[0] if n > chunk else 0
            if pad > 0:  # pad the tail chunk: one compiled shape per resolution
                o = np.concatenate([o, np.repeat(o[-1:], pad, axis=0)], axis=0)
                d = np.concatenate([d, np.repeat(d[-1:], pad, axis=0)], axis=0)
            r = Rays(jnp.asarray(o), jnp.asarray(d), rays.dist_min, rays.dist_max)
            out = jax.device_get(self._infer(pipeline, r))
            outs.append(out[:chunk - pad] if pad > 0 else out)
        rb = RenderBuffer.cat(outs) if len(outs) > 1 else outs[0]
        # Surface raytrace interval-buffer saturation (fixed-capacity DDA can drop occupied
        # intervals; the reference's unbounded nuggets cannot — octree_as.raytrace note).
        novf = rb.channels.get("num_overflow")
        if novf is not None and float(novf) > 0:
            log.warning("raytrace overflow: %d rays saturated the interval buffer and may "
                        "have dropped occupied cells — raise the blas raytrace capacity "
                        "(tracer raytrace_capacity / octree_as.raytrace capacity)",
                        int(float(novf)))
        return self.apply_shading(pipeline, rays, rb)

    def apply_shading(self, pipeline, rays: Rays, rb: RenderBuffer) -> RenderBuffer:
        """normal / matcap shading + point-light shadows on hit points
        (reference offline_renderer.py shading modes)."""
        normal = rb.channels.get("normal")
        hit = rb.channels.get("hit")
        if normal is None or hit is None:
            return rb
        rgb = rb.rgb
        if self.shading_mode == "matcap" and self.matcap_path:
            from wisp_tpu.ops.shaders import matcap_shader
            dirs = jnp.asarray(np.asarray(rays.dirs))
            shaded = matcap_shader(dirs, jnp.asarray(normal), self.matcap_path)
            rgb = jnp.where(jnp.asarray(hit) > 0, shaded, jnp.asarray(rgb))
        if self.shadow and "xyz" in rb.channels and pipeline.tracer is not None:
            from wisp_tpu.ops.shaders import pointlight_shadow_shader
            mult = pointlight_shadow_shader(
                pipeline.nef, pipeline.tracer, jnp.asarray(rb.channels["xyz"]),
                jnp.asarray(hit)[:, 0] > 0)
            rgb = jnp.asarray(rgb) * mult
        out = dict(rb.channels)
        out["rgb"] = jnp.asarray(rgb)
        return RenderBuffer(**out)

    def render_lookat(self, pipeline, f=(0.0, 0.0, -3.0), t=(0.0, 0.0, 0.0),
                      fov: float = 30.0, lod_idx=None,
                      camera_clamp=(0.0, 10.0)) -> RenderBuffer:
        """Render from a lookat camera (reference offline_renderer.py:23-89)."""
        up = (0.0, 1.0, 0.0)
        if abs(np.asarray(f)[1]) > 0.95 * np.linalg.norm(np.asarray(f)):
            up = (1.0, 0.0, 0.0)
        camera = Camera.from_args(eye=f, at=t, up=up, width=self.width,
                                  height=self.height, fov=np.radians(fov),
                                  near=camera_clamp[0], far=camera_clamp[1])
        rays = generate_pinhole_rays(camera)
        rb = self.render(pipeline, rays, lod_idx)
        return rb.reshape(self.height, self.width, -1)

    def render_snapshot(self, pipeline, f=(0.0, 0.0, -3.0), t=(0.0, 0.0, 0.0),
                        fov: float = 30.0, lod_idx=None,
                        camera_clamp=(0.0, 10.0)) -> RenderBuffer:
        return self.render_lookat(pipeline, f=f, t=t, fov=fov, lod_idx=lod_idx,
                                  camera_clamp=camera_clamp)

    def render_360(self, pipeline, num_angles: int = 20, radius: float = 3.0,
                   elevation: float = 0.65, fov: float = 30.0) -> List[np.ndarray]:
        """360° orbit frames (reference tracker.py:255-315 feeds these to wandb)."""
        frames = []
        for i in range(num_angles):
            angle = 2 * np.pi * i / num_angles
            eye = (radius * np.cos(angle), elevation, radius * np.sin(angle))
            rb = self.render_lookat(pipeline, f=eye, t=(0.0, 0.0, 0.0), fov=fov)
            frames.append(np.asarray(rb.image().rgb))
        return frames

    def sdf_slice(self, sdf_fn, dim: int = 0, depth: float = 0.0,
                  res: int = 256) -> np.ndarray:
        """Colormapped SDF cross-section (reference offline_renderer.py:254-329)."""
        from wisp_tpu.ops.geometric import normalized_slice
        coords = normalized_slice(res, res, dim=dim, depth=depth).reshape(-1, 3)
        d = np.asarray(sdf_fn(jnp.asarray(coords))).reshape(res, res)
        img = np.zeros((res, res, 3), dtype=np.float32)
        inside = d < 0
        img[..., 0] = np.where(inside, 0.2, 1.0 - np.clip(np.abs(d) * 4, 0, 1))
        img[..., 1] = np.where(inside, 0.4 + np.clip(-d * 4, 0, 0.6), 0.8)
        img[..., 2] = np.where(inside, 1.0, 1.0 - np.clip(np.abs(d) * 4, 0, 1))
        # zero-level set in white
        img[np.abs(d) < (2.0 / res)] = 1.0
        return img
