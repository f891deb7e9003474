"""SPC sampling ops (reference wisp/ops/spc/sampling.py:12-71)."""

from __future__ import annotations

import numpy as np


def sample_spc(points: np.ndarray, level: int, num_samples_per_voxel: int,
               rng=None) -> np.ndarray:
    """Uniform samples inside occupied voxels (reference sampling.py:12-38):
    voxel coords [N,3] at ``level`` → [N*num_samples, 3] jittered samples in [-1,1]^3."""
    rng = np.random.default_rng() if rng is None else rng
    res = 2 ** level
    pts = np.asarray(points, dtype=np.float32)
    base = np.repeat(pts, num_samples_per_voxel, axis=0)
    jitter = rng.random((base.shape[0], 3), dtype=np.float32)
    return (base + jitter) * (2.0 / res) - 1.0


def sample_from_depth_intervals(t_entry, t_exit, mask, num_samples: int, rng=None):
    """Jittered samples inside ray/voxel intersection intervals
    (reference sampling.py:41-59): [R,K] intervals → depths [R,K,num_samples]."""
    rng = np.random.default_rng() if rng is None else rng
    t_entry = np.asarray(t_entry)
    t_exit = np.asarray(t_exit)
    u = rng.random((*t_entry.shape, num_samples)).astype(np.float32)
    depths = t_entry[..., None] + (t_exit - t_entry)[..., None] * u
    return np.where(np.asarray(mask)[..., None], depths, 0.0)


def expand_pack_boundary(boundary: np.ndarray, num_samples: int) -> np.ndarray:
    """Repeat each pack-boundary flag num_samples times (reference sampling.py:62-71). In the
    rectangular layout this is a plain repeat along a new axis."""
    return np.repeat(np.asarray(boundary), num_samples, axis=-1)
