"""Morton codes + sparse-octree primitive ops.

TPU-native counterpart of kaolin's Structured Point Cloud CUDA ops used by the reference
(SURVEY.md §2.2: quantize_points / points_to_morton / morton_to_points /
unbatched_points_to_octree / scan_octrees / generate_points / points_to_corners /
unbatched_get_level_points). Instead of packed octree byte strings walked bit-by-bit on GPU,
the octree here is a *level table*: per level, the sorted morton codes of occupied cells.
Queries become vectorized binary searches (jnp.searchsorted) and the hot-path occupancy test is
a dense bitfield gather — both XLA-friendly fixed-shape ops.

Construction is host-side numpy (topology changes are rare — at pruning cadence only,
reference nerf.py:175-212); traversal/query run on device.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_OCTREE_LEVEL = 10  # 3*10 = 30 morton bits, fits uint32/int32


# ---------------------------------------------------------------------------------------------
# Quantization + morton (host + device versions)
# ---------------------------------------------------------------------------------------------

def quantize_points(x: np.ndarray, level: int) -> np.ndarray:
    """[-1,1]^3 floats -> integer grid coords at ``level`` (res = 2^level), clipped
    (kaolin spc_ops.quantize_points semantics)."""
    res = 2 ** level
    q = np.floor((np.asarray(x) + 1.0) * (res / 2.0)).astype(np.int32)
    return np.clip(q, 0, res - 1)


def _part1by2_np(v: np.ndarray) -> np.ndarray:
    """Spread bits of v (uint64) to every 3rd position (morton helper)."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def points_to_morton(points: np.ndarray) -> np.ndarray:
    """Integer grid coords [N,3] -> morton codes [N] (uint64, host)."""
    p = np.asarray(points).astype(np.uint64)
    return (_part1by2_np(p[:, 0]) | (_part1by2_np(p[:, 1]) << np.uint64(1))
            | (_part1by2_np(p[:, 2]) << np.uint64(2)))


def _compact1by2_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x1249249249249249)
    v = (v ^ (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    v = (v ^ (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    v = (v ^ (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    v = (v ^ (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    v = (v ^ (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return v


def morton_to_points(codes: np.ndarray) -> np.ndarray:
    """Morton codes [N] -> integer grid coords [N,3] (host)."""
    c = np.asarray(codes).astype(np.uint64)
    return np.stack([
        _compact1by2_np(c),
        _compact1by2_np(c >> np.uint64(1)),
        _compact1by2_np(c >> np.uint64(2)),
    ], axis=-1).astype(np.int32)


def _part1by2_jnp(v):
    """Device-side bit spread for levels <= MAX_OCTREE_LEVEL (uint32)."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x30000FF)
    v = (v | (v << 8)) & jnp.uint32(0x300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x9249249)
    return v


def morton3d(points) -> jax.Array:
    """Device: integer coords [...,3] -> uint32 morton codes (levels <= 10)."""
    p = points.astype(jnp.uint32)
    return (_part1by2_jnp(p[..., 0]) | (_part1by2_jnp(p[..., 1]) << 1)
            | (_part1by2_jnp(p[..., 2]) << 2))


def quantize_points_jnp(x, level: int):
    """Device version of quantize_points."""
    res = 2 ** level
    q = jnp.floor((x + 1.0) * (res / 2.0)).astype(jnp.int32)
    return jnp.clip(q, 0, res - 1)


# ---------------------------------------------------------------------------------------------
# Octree construction (host)
# ---------------------------------------------------------------------------------------------

def build_level_table(quantized_points: np.ndarray, level: int
                      ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """From occupied leaf cells at ``level``, build all ancestor levels.

    Returns (codes_per_level, points_per_level), level 0..level, each sorted by morton —
    the counterpart of kaolin's unbatched_points_to_octree + scan_octrees + generate_points
    chain (reference ops/spc/conversions.py:72-88): same information, table layout instead of
    packed bytes. Uses the native C++ builder (wisp_tpu/csrc) when available — construction
    is host-side and sort/unique-bound at reference scales (100M mesh samples).
    """
    native = _native()
    if native is not None:
        codes = native.morton_encode(np.asarray(quantized_points, dtype=np.int32))
        codes = np.unique(codes)
        codes_per_level = [None] * (level + 1)
        codes_per_level[level] = codes
        for l in range(level - 1, -1, -1):
            codes = native.parent_level(codes)
            codes_per_level[l] = codes
        points_per_level = [native.morton_decode(c) for c in codes_per_level]
        return codes_per_level, points_per_level

    codes = np.unique(points_to_morton(quantized_points))
    codes_per_level = [None] * (level + 1)
    codes_per_level[level] = codes
    for l in range(level - 1, -1, -1):
        codes = np.unique(codes >> np.uint64(3))
        codes_per_level[l] = codes
    points_per_level = [morton_to_points(c) for c in codes_per_level]
    return codes_per_level, points_per_level


def _native():
    """The optional C++ builder (None when unavailable)."""
    try:
        from wisp_tpu import csrc
        return csrc if csrc.available() else None
    except Exception:  # noqa: BLE001
        return None


def points_to_corners(points) -> jax.Array:
    """Cell coords [N,3] -> 8 corner coords [N,8,3] (kaolin spc_ops.points_to_corners;
    corner order: bit k of corner index toggles axis k... reference uses z-fastest order
    matching ops/grid.py:56-71)."""
    offsets = jnp.asarray(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=points.dtype)
    return points[..., None, :] + offsets


def dilate_points(quantized_points: np.ndarray, level: int) -> np.ndarray:
    """26-neighborhood dilation of occupied cells (reference ops/spc/processing.py:13-46)."""
    offsets = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                   indexing="ij"), axis=-1).reshape(-1, 3)
    pts = (quantized_points[:, None, :] + offsets[None]).reshape(-1, 3)
    res = 2 ** level
    pts = np.clip(pts, 0, res - 1)
    codes = np.unique(points_to_morton(pts))
    return morton_to_points(codes)


# ---------------------------------------------------------------------------------------------
# Dual octree + trinkets (for OctreeGrid feature storage)
# ---------------------------------------------------------------------------------------------

def make_dual(points_per_level: List[np.ndarray]
              ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Build the dual octree (unique cell-corner vertices per level) and trinkets
    (cell -> 8 dual-vertex indices), counterpart of kaolin's unbatched_make_dual +
    unbatched_make_trinkets (reference ops/spc/constructors.py:45-46).

    Returns (dual_points_per_level [Vl,3], trinkets_per_level [Nl,8])."""
    dual_points, trinkets = [], []
    for l, pts in enumerate(points_per_level):
        res_plus = 2 ** l + 1
        corners = np.asarray(points_to_corners(jnp.asarray(pts))).reshape(-1, 3)
        corner_keys = (corners[:, 0].astype(np.int64) * res_plus * res_plus
                       + corners[:, 1].astype(np.int64) * res_plus
                       + corners[:, 2].astype(np.int64))
        uniq, inverse = np.unique(corner_keys, return_inverse=True)
        vx = (uniq // (res_plus * res_plus)).astype(np.int32)
        vy = ((uniq // res_plus) % res_plus).astype(np.int32)
        vz = (uniq % res_plus).astype(np.int32)
        dual_points.append(np.stack([vx, vy, vz], axis=-1))
        trinkets.append(inverse.reshape(-1, 8).astype(np.int32))
    return dual_points, trinkets
