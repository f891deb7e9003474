"""Mesh sampling + geometry ops.

Counterpart of reference wisp/ops/mesh/ (normalize, area_weighted_distribution, random_face,
sample_surface, sample_near_surface, sample_uniform, point_sample, per_face_normals,
barycentric_coordinates, closest_point_on_triangle). Host-side numpy for sampling (dataset
construction), jnp for the differentiable/batched geometry kernels.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def normalize(vertices: np.ndarray, faces: np.ndarray, mode: str = "sphere"
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Normalize a mesh into [-1,1]-ish extent (reference normalize.py):
    'sphere' — center at origin, scale by bounding-sphere radius (leaves margin);
    'aabb' — fit the AABB to [-1,1]^3; 'planar' — xz only; 'none' — unchanged."""
    v = np.asarray(vertices, dtype=np.float32)
    if mode == "none":
        return v, faces
    center = (v.max(0) + v.min(0)) / 2.0
    v = v - center
    if mode == "sphere":
        scale = np.linalg.norm(v, axis=-1).max() * (1.0 / 0.9)
        v = v / scale
    elif mode == "aabb":
        v = v / np.abs(v).max()
    elif mode == "planar":
        scale = np.abs(v[:, [0, 2]]).max() * (1.0 / 0.9)
        v = v / scale
    else:
        raise ValueError(f"unknown normalize mode {mode!r}")
    return v.astype(np.float32), faces


def per_face_normals(vertices, faces):
    """[F,3] unit normals (reference per_face_normals.py)."""
    v = np.asarray(vertices)
    f = np.asarray(faces)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def face_areas(vertices, faces):
    v = np.asarray(vertices)
    f = np.asarray(faces)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


def area_weighted_distribution(vertices, faces):
    """Face sampling probabilities ∝ area (reference area_weighted_distribution.py)."""
    areas = face_areas(vertices, faces)
    return areas / areas.sum()


def random_face(vertices, faces, num_samples: int, distrib=None, rng=None):
    """Sample face indices by area (reference random_face.py)."""
    rng = np.random.default_rng() if rng is None else rng
    if distrib is None:
        distrib = area_weighted_distribution(vertices, faces)
    return rng.choice(len(faces), size=num_samples, p=distrib)


def sample_surface(vertices, faces, num_samples: int, rng=None,
                   return_normals: bool = False):
    """[N,3] uniform area-weighted surface samples (reference sample_surface.py).
    With ``return_normals``, also returns the sampled faces' unit normals [N,3]
    (reference sample_surface.py returns (samples, normals) — consumed by the SDF
    dataset's get_normals option, mesh_sdf_dataset.py:193-195)."""
    rng = np.random.default_rng(0) if rng is None else rng
    fidx = random_face(vertices, faces, num_samples, rng=rng)
    v = np.asarray(vertices)
    f = np.asarray(faces)[fidx]
    u = rng.random((num_samples, 2)).astype(np.float32)
    flip = u.sum(-1) > 1.0
    u[flip] = 1.0 - u[flip]
    a, b = u[:, 0:1], u[:, 1:2]
    pts = (v[f[:, 0]] * (1 - a - b) + v[f[:, 1]] * a
           + v[f[:, 2]] * b).astype(np.float32)
    if return_normals:
        normals = np.asarray(per_face_normals(vertices, faces), np.float32)[fidx]
        return pts, normals
    return pts


def sample_near_surface(vertices, faces, num_samples: int, variance: float = 0.01,
                        rng=None) -> np.ndarray:
    """Surface samples + gaussian offset (reference sample_near_surface.py)."""
    rng = np.random.default_rng(0) if rng is None else rng
    pts = sample_surface(vertices, faces, num_samples, rng=rng)
    return pts + rng.normal(0.0, variance, pts.shape).astype(np.float32)


def sample_uniform(num_samples: int, rng=None) -> np.ndarray:
    """Uniform samples in [-1,1]^3 (reference sample_uniform.py)."""
    rng = np.random.default_rng(0) if rng is None else rng
    return (rng.random((num_samples, 3)).astype(np.float32) * 2.0 - 1.0)


def point_sample(vertices, faces, modes: List[str], num_samples: int, rng=None) -> np.ndarray:
    """Combined sampling per mode list (reference point_sample.py): each entry of ``modes``
    ('rand' | 'near' | 'trace') contributes num_samples points; 'trace' = on-surface."""
    rng = np.random.default_rng(0) if rng is None else rng
    out = []
    for mode in modes:
        if mode == "rand":
            out.append(sample_uniform(num_samples, rng=rng))
        elif mode == "near":
            out.append(sample_near_surface(vertices, faces, num_samples, rng=rng))
        elif mode == "trace":
            out.append(sample_surface(vertices, faces, num_samples, rng=rng))
        else:
            raise ValueError(f"unknown sample mode {mode!r}")
    return np.concatenate(out).astype(np.float32)


def barycentric_coordinates(points, a, b, c):
    """Barycentric coords of points wrt triangles (jnp; reference
    barycentric_coordinates.py)."""
    v0 = b - a
    v1 = c - a
    v2 = points - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = d00 * d11 - d01 * d01
    v = (d11 * d20 - d01 * d21) / jnp.maximum(denom, 1e-12)
    w = (d00 * d21 - d01 * d20) / jnp.maximum(denom, 1e-12)
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def closest_point_on_triangle(p, a, b, c):
    """Closest point on triangle(s) abc to point(s) p, vectorized in jnp (replaces the
    per-thread CUDA routine in the reference's mesh2sdf kernel).

    Branch-free, order-independent formulation: the closest point is either the in-plane
    projection (when its barycentrics are all non-negative) or the nearest of the three
    *clamped edge projections* (which cover the vertices as clamp endpoints). Unlike the
    classic sequential Voronoi-region cascade, every candidate here is valid standalone, so
    a masked min is exact. All inputs broadcastable [..., 3].
    """
    def _edge_proj(p0, e0, e1):
        d = e1 - e0
        t = jnp.sum((p0 - e0) * d, -1) / jnp.maximum(jnp.sum(d * d, -1), 1e-20)
        return e0 + jnp.clip(t, 0.0, 1.0)[..., None] * d

    cand_ab = _edge_proj(p, a, b)
    cand_bc = _edge_proj(p, b, c)
    cand_ca = _edge_proj(p, c, a)

    # in-plane projection + barycentric inside-test
    ab = b - a
    ac = c - a
    n = jnp.cross(ab, ac)
    nn = jnp.maximum(jnp.sum(n * n, -1), 1e-20)
    dist_plane = jnp.sum((p - a) * n, -1) / nn
    proj = p - dist_plane[..., None] * n
    # barycentrics of proj
    v0, v1, v2 = ab, ac, proj - a
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    inside = (v >= 0.0) & (w >= 0.0) & (v + w <= 1.0)

    def d2(q):
        return jnp.sum((p - q) ** 2, -1)

    best = cand_ab
    best = jnp.where((d2(cand_bc) < d2(best))[..., None], cand_bc, best)
    best = jnp.where((d2(cand_ca) < d2(best))[..., None], cand_ca, best)
    return jnp.where(inside[..., None], proj, best)
