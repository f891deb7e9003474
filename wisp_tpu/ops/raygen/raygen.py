"""Ray generation (reference wisp/ops/raygen/raygen.py:23-130).

Pixel-grid → camera-space directions → world-space Rays, for pinhole and orthographic
cameras. Pure jnp given a Camera's matrices, so raygen can live inside jit for interactive
rendering."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.rays import Rays


def generate_centered_pixel_coords(img_width: int, img_height: int,
                                   res_x: int = None, res_y: int = None):
    """Pixel-center sample coords over an image plane grid (reference raygen.py:23-37):
    returns (y_coords [res_y, res_x], x_coords [res_y, res_x]) in source-image pixel units."""
    res_x = res_x or img_width
    res_y = res_y or img_height
    pixel_y = (jnp.arange(res_y, dtype=jnp.float32) + 0.5) * (img_height / res_y)
    pixel_x = (jnp.arange(res_x, dtype=jnp.float32) + 0.5) * (img_width / res_x)
    return jnp.meshgrid(pixel_y, pixel_x, indexing="ij")


def generate_pinhole_rays(camera: Camera, coords_grid: Tuple = None) -> Rays:
    """Pinhole raygen (reference raygen.py:40-86): pixel coords → inverse intrinsics
    (camera space, -Z forward) → inverse extrinsics (world)."""
    if coords_grid is None:
        coords_grid = generate_centered_pixel_coords(camera.width, camera.height)
    pixel_y, pixel_x = coords_grid
    pixel_y = pixel_y.reshape(-1)
    pixel_x = pixel_x.reshape(-1)

    cx = camera.width * 0.5 + camera.x0
    cy = camera.height * 0.5 + camera.y0
    dir_x = (pixel_x - cx) / camera.focal_x
    dir_y = -(pixel_y - cy) / camera.focal_y
    dir_z = -jnp.ones_like(dir_x)
    dirs_cam = jnp.stack([dir_x, dir_y, dir_z], axis=-1)

    c2w = jnp.asarray(camera.cam_to_world)
    dirs_world = dirs_cam @ c2w[:3, :3].T
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[:3, 3], dirs_world.shape)
    return Rays(origins=origins, dirs=dirs_world,
                dist_min=camera.near, dist_max=camera.far)


def generate_ortho_rays(camera: Camera, coords_grid: Tuple = None) -> Rays:
    """Orthographic raygen (reference raygen.py:88-130): parallel rays along -Z spanning
    fov_distance in camera space."""
    if coords_grid is None:
        coords_grid = generate_centered_pixel_coords(camera.width, camera.height)
    pixel_y, pixel_x = coords_grid
    pixel_y = pixel_y.reshape(-1)
    pixel_x = pixel_x.reshape(-1)

    aspect = camera.width / camera.height
    span_x = camera.fov_distance * aspect
    span_y = camera.fov_distance
    x = (pixel_x / camera.width * 2.0 - 1.0) * span_x
    y = -(pixel_y / camera.height * 2.0 - 1.0) * span_y

    c2w = jnp.asarray(camera.cam_to_world)
    origins_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    origins = origins_cam @ c2w[:3, :3].T + c2w[:3, 3]
    dirs = jnp.broadcast_to(-c2w[:3, 2], origins.shape)
    return Rays(origins=origins, dirs=dirs, dist_min=camera.near, dist_max=camera.far)


def generate_default_grid(width: int, height: int):
    return generate_centered_pixel_coords(width, height)
