"""Geometric ops (reference wisp/ops/geometric.py:15-158): coordinate grids, sphere sampling,
environment mapping, depth-bound search for sphere tracing."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalized_grid(height: int, width: int, use_aspect: bool = True, dtype=jnp.float32):
    """[H, W, 2] image-plane coordinate grid in [-1, 1] (reference geometric.py:73-95).
    With ``use_aspect`` the x range is scaled by W/H."""
    ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    if use_aspect:
        xs = xs * (width / height)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def normalized_slice(height: int, width: int, dim: int = 0, depth: float = 0.0,
                     dtype=jnp.float32):
    """[H, W, 3] axis-aligned slice plane through the volume at ``depth`` along ``dim``
    (reference geometric.py:98-121). Used to visualize SDF cross-sections."""
    window = normalized_grid(height, width, use_aspect=False, dtype=dtype)
    depth_plane = jnp.full((height, width, 1), depth, dtype=dtype)
    if dim == 0:
        coords = jnp.concatenate([depth_plane, window], axis=-1)
    elif dim == 1:
        coords = jnp.concatenate([window[..., 0:1], depth_plane, window[..., 1:2]], axis=-1)
    elif dim == 2:
        coords = jnp.concatenate([window, depth_plane], axis=-1)
    else:
        raise ValueError(f"dim must be 0, 1 or 2, got {dim}")
    return coords


def sample_unif_sphere(n: int, rng=None) -> np.ndarray:
    """[n, 3] uniform samples on the unit sphere (reference geometric.py:124-134)."""
    rng = np.random.default_rng() if rng is None else rng
    u = rng.random((2, n))
    z = 1 - 2 * u[0]
    r = np.sqrt(np.maximum(1 - z ** 2, 0.0))
    phi = 2 * np.pi * u[1]
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def sample_fib_sphere(n: int) -> np.ndarray:
    """[n, 3] near-uniform Fibonacci-lattice sphere points (reference geometric.py:137-147)."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - 2 * (i / (n - 1))
    r = np.sqrt(np.maximum(1 - y * y, 0.0))
    theta = phi * i
    return np.stack([np.cos(theta) * r, y, np.sin(theta) * r], axis=-1).astype(np.float32)


def spherical_envmap(ray_dir, normal):
    """Matcap UV coords from view dir + normal (reference geometric.py:150-158 +
    shaders/matcap.py): reflect view about normal, map to sphere texture coords in [0,1]^2."""
    r = ray_dir - 2.0 * jnp.sum(ray_dir * normal, axis=-1, keepdims=True) * normal
    m = 2.0 * jnp.sqrt(jnp.maximum(r[..., 0:1] ** 2 + r[..., 1:2] ** 2 +
                                   (r[..., 2:3] + 1.0) ** 2, 1e-12))
    u = r[..., 0:1] / m + 0.5
    v = r[..., 1:2] / m + 0.5
    return jnp.concatenate([u, 1.0 - v], axis=-1)


def find_depth_bound(query_depth, entry_depth, exit_depth, mask):
    """For each query depth, find the first interval whose exit is beyond it — the AABB-skip
    step of sphere tracing (reference ops/geometric.py:15 → csrc find_depth_bound_cuda.cu:16-45).

    TPU-native form: per-ray fixed-width interval buffers instead of packed nuggets.

    Args:
        query_depth: [R] current march depth per ray.
        entry_depth / exit_depth: [R, I] sorted interval bounds per ray (padded).
        mask: [R, I] validity of each interval.

    Returns:
        (next_depth [R], valid [R]): entry of the containing/next interval (clamped to the
        query depth if inside an interval), and whether any interval remains.
    """
    beyond = jnp.logical_and(mask, exit_depth > query_depth[:, None])
    any_valid = jnp.any(beyond, axis=-1)
    first = jnp.argmax(beyond, axis=-1)
    entry = jnp.take_along_axis(entry_depth, first[:, None], axis=-1)[:, 0]
    next_depth = jnp.maximum(entry, query_depth)
    return jnp.where(any_valid, next_depth, query_depth), any_valid


def voxel_boundary_step(pos, dirs, voxel, eps_frac=1e-3):
    """Exact DDA step: distance along each ray from ``pos`` to the NEXT voxel-grid plane,
    plus a small nudge so the landing point is strictly inside the next cell.

    The grid is the uniform [-1,1]^3 lattice with cell size ``voxel``. Stepping by this
    amount crosses exactly one cell boundary — it can never pass THROUGH a cell interior —
    so a marcher that uses it whenever its free-space skip is not strictly larger visits
    every cell the ray intersects (the skip-only variant's 0.5·voxel floor could hop over
    a corner sliver whose chord is shorter). Counterpart of the per-step advance in the
    reference's CUDA raytrace (kaolin csrc raytrace.cu ray_aabb stepping).

    Args:
        pos: [N, 3] current positions.
        dirs: [N, 3] ray directions (need not be normalized; zero components allowed).
        voxel: cell edge length (2/res).

    Returns:
        [N] step length along the ray (strictly positive).
    """
    # distance to the next plane per axis: dir>0 → ceil boundary, dir<0 → floor boundary
    q = jnp.floor((pos + 1.0) / voxel)
    next_plane = -1.0 + (q + (dirs > 0.0)) * voxel
    safe_dirs = jnp.where(jnp.abs(dirs) > 1e-12, dirs, 1.0)
    dt = jnp.where(jnp.abs(dirs) > 1e-12, (next_plane - pos) / safe_dirs, jnp.inf)
    # a coordinate exactly on its boundary yields dt=0 for that axis; the eps nudge below
    # still guarantees progress
    dt = jnp.min(jnp.maximum(dt, 0.0), axis=-1)
    return dt + eps_frac * voxel


def look_at(eye, at, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Right-handed look-at view matrix [4,4] (world → camera)."""
    eye = np.asarray(eye, dtype=np.float32)
    at = np.asarray(at, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)
    forward = at - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, up)
    norm = np.linalg.norm(right)
    if norm < 1e-6:  # eye-at axis parallel to up (e.g. top-down view): pick another up
        right = np.cross(forward, np.array([0.0, 0.0, 1.0], np.float32))
        norm = np.linalg.norm(right)
        if norm < 1e-6:
            right = np.cross(forward, np.array([1.0, 0.0, 0.0], np.float32))
            norm = np.linalg.norm(right)
    right = right / norm
    true_up = np.cross(right, forward)
    view = np.eye(4, dtype=np.float32)
    view[0, :3] = right
    view[1, :3] = true_up
    view[2, :3] = -forward
    view[:3, 3] = -view[:3, :3] @ eye
    return view
