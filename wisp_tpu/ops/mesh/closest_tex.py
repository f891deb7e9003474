"""Closest-point texture sampling over a materialed mesh.

Counterpart of reference wisp/ops/mesh/closest_tex.py:15-55 and sample_tex.py:12: for each
query point, find the closest surface point, convert to barycentric coordinates on the hit
triangle, interpolate the triangle's UVs, and sample the material's diffuse texture (or flat
diffuse color). Host-side numpy/jnp — this is dataset-preprocessing code, pinned off the
accelerator like compute_sdf (each eager dispatch over the remote-TPU tunnel costs seconds).

Materials are dicts mirroring the reference's tinyobjloader bundle:
  {'diffuse': np.float32[3]}                      — flat color, and/or
  {'diffuse_texname': np.float32[H, W, 3]}        — texture image in [0, 1].
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def sample_tex(tp: np.ndarray, tm: np.ndarray, materials: List[dict]) -> np.ndarray:
    """Sample RGB from per-point UVs + material ids (reference sample_tex.py:12-60).

    Args:
        tp: [N, 2] UV coordinates in [0, 1].
        tm: [N] material indices (-1 = no material -> black, like the reference's zeros).
        materials: list of material dicts (see module docstring).

    Returns:
        [N, 3] float32 RGB. Texture lookup is bilinear with reflection padding and
        align_corners=True semantics, matching the reference's F.grid_sample call
        (sample_tex.py:47) including its UV y-flip.
    """
    tp = np.asarray(tp, np.float32)
    tm = np.asarray(tm, np.int64)
    rgb = np.zeros((tp.shape[0], 3), np.float32)
    if len(materials) == 0:
        return rgb
    assert tm.max() > -1, \
        "No materials detected! Check the material definition on your mesh."

    # grid_sample coordinate convention: x in [-1,1] maps across W, y across H, y flipped
    # vs UV convention (reference sample_tex.py:33-35)
    gx = tp[:, 0] * 2.0 - 1.0
    gy = -(tp[:, 1] * 2.0 - 1.0)

    for i in range(int(tm.max()) + 1):
        mask = tm == i
        if not mask.any() or i >= len(materials):
            continue
        mat = materials[i]
        if "diffuse_texname" not in mat:
            if "diffuse" in mat:
                rgb[mask] = np.asarray(mat["diffuse"], np.float32)[None, :3]
            continue
        img = np.asarray(mat["diffuse_texname"], np.float32)[..., :3]
        h, w = img.shape[:2]
        # align_corners=True: grid -1 -> pixel 0, +1 -> pixel (size-1)
        fx = (gx[mask] + 1.0) * (w - 1) / 2.0
        fy = (gy[mask] + 1.0) * (h - 1) / 2.0

        def _reflect(v, size):
            # reflection padding on the continuous coordinate (period 2*(size-1))
            if size == 1:
                return np.zeros_like(v)
            p = 2.0 * (size - 1)
            v = np.abs(v) % p
            return np.where(v > (size - 1), p - v, v)

        fx = _reflect(fx, w)
        fy = _reflect(fy, h)
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        ax = (fx - x0)[:, None]
        ay = (fy - y0)[:, None]
        top = img[y0, x0] * (1 - ax) + img[y0, x1] * ax
        bot = img[y1, x0] * (1 - ax) + img[y1, x1] * ax
        rgb[mask] = top * (1 - ay) + bot * ay
    return rgb


def closest_tex(vertices: np.ndarray, faces: np.ndarray,
                texv: Optional[np.ndarray], texf: Optional[np.ndarray],
                materials: List[dict], face_mats: np.ndarray,
                points: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGB of the closest surface point for each query (reference closest_tex.py:15-55).

    Args:
        vertices/faces: mesh [V,3] / [F,3].
        texv: [TV, 2] UV vertices or None (None -> barycentrics used as 'UV', like the
            reference's TV.shape[0] == 0 fallback).
        texf: [F, 3] per-face UV indices (aligned with faces) or None.
        materials: material dict list. face_mats: [F] per-face material id.
        points: [N, 3] query points.

    Returns:
        (rgb [N,3], hit_pts [N,3], dist [N] unsigned distance). The reference returns the
        signed variant from its CUDA kernel; callers that need a signed distance use
        ops.mesh.compute_sdf (pseudonormal sign) — see MeshSampledSDFDataset.resample.
    """
    from wisp_tpu.ops.mesh.compute_sdf import closest_point
    from wisp_tpu.ops.mesh.ops import barycentric_coordinates
    import jax.numpy as jnp

    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    pts = np.asarray(points, np.float32)
    dist, hit_pts, hit_tidx = closest_point(v, f, pts)

    hit_f = f[hit_tidx]                                   # [N, 3] vertex ids
    a, b, c = v[hit_f[:, 0]], v[hit_f[:, 1]], v[hit_f[:, 2]]
    bc = np.asarray(barycentric_coordinates(jnp.asarray(hit_pts), jnp.asarray(a),
                                            jnp.asarray(b), jnp.asarray(c)))
    bc = np.clip(bc, 0.0, 1.0)

    tm = np.asarray(face_mats, np.int64)[hit_tidx] if face_mats is not None \
        else np.full(len(pts), -1, np.int64)
    if texv is not None and texf is not None and len(texv) > 0:
        tf = np.asarray(texf, np.int64)[hit_tidx]          # [N, 3] uv-vertex ids
        uvs = np.asarray(texv, np.float32)[tf]             # [N, 3, 2]
        tp = (uvs * bc[..., None]).sum(axis=1)             # [N, 2]
    else:
        tp = bc[:, :2]
    rgb = sample_tex(tp, tm, materials)
    return rgb, hit_pts, dist
