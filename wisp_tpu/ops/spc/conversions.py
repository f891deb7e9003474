"""SPC conversion ops (reference wisp/ops/spc/conversions.py:15-109): pointcloud/mesh →
octree, plus attribute averaging per cell."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from wisp_tpu.ops.spc.core import (build_level_table, points_to_morton, quantize_points)


def pointcloud_to_octree(pointcloud: np.ndarray, level: int,
                         attributes: Optional[np.ndarray] = None,
                         dilate: int = 0):
    """Points in [-1,1]^3 → per-level morton tables; when ``attributes`` given, also returns
    per-occupied-cell averaged attributes in morton order
    (reference conversions.py:15-69)."""
    from wisp_tpu.ops.spc.core import dilate_points
    q = quantize_points(np.asarray(pointcloud), level)
    codes = points_to_morton(q)
    if attributes is not None:
        order = np.argsort(codes)
        sorted_codes = codes[order]
        sorted_attr = np.asarray(attributes)[order]
        uniq, starts = np.unique(sorted_codes, return_index=True)
        sums = np.add.reduceat(sorted_attr, starts, axis=0)
        counts = np.diff(np.append(starts, len(sorted_codes)))[:, None]
        avg = sums / counts
    qd = q
    for _ in range(dilate):
        qd = dilate_points(qd, level)
    codes_per_level, _ = build_level_table(qd, level)
    if attributes is not None:
        # map averaged attrs onto the (possibly dilated) leaf cells; dilated cells get zeros
        leaf = codes_per_level[level]
        attr_out = np.zeros((len(leaf), avg.shape[-1]), dtype=np.float32)
        idx = np.searchsorted(leaf, uniq)
        attr_out[idx] = avg
        return codes_per_level, attr_out
    return codes_per_level


def mesh_to_octree(vertices: np.ndarray, faces: np.ndarray, level: int,
                   num_samples: int = 100_000_000):
    """Surface-sample a mesh densely and build octree leaf tables
    (reference conversions.py:91-109; 100M samples + jitter augment)."""
    from wisp_tpu.ops.mesh import sample_surface
    samples = sample_surface(vertices, faces, num_samples)
    rng = np.random.default_rng(0)
    jitter = (rng.random(samples.shape).astype(np.float32) * 2 - 1) / (2 ** level)
    pts = np.clip(np.concatenate([samples, samples + jitter]), -1.0, 1.0 - 1e-6)
    codes_per_level, _ = build_level_table(quantize_points(pts, level), level)
    return codes_per_level


def mesh_to_spc(vertices: np.ndarray, faces: np.ndarray, level: int):
    """Mesh → (codes_per_level, points_per_level) 'SPC' bundle
    (reference conversions.py:80-88)."""
    from wisp_tpu.ops.spc.core import morton_to_points
    codes_per_level = mesh_to_octree(vertices, faces, level)
    points_per_level = [morton_to_points(c) for c in codes_per_level]
    return codes_per_level, points_per_level


def octree_to_spc(codes_per_level):
    """Level tables → (points, pyramid) in the kaolin scan_octrees/generate_points sense
    (reference conversions.py:72-88): concatenated per-level coords + per-level
    (count, offset) table."""
    from wisp_tpu.ops.spc.core import morton_to_points
    points = np.concatenate([morton_to_points(c) for c in codes_per_level])
    counts = [len(c) for c in codes_per_level]
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pyramid = np.stack([np.asarray(counts), offsets])
    return points, pyramid
