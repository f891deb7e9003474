"""Pointcloud ops (reference wisp/ops/pointcloud/): depth-image → pointcloud unprojection and
normalization — used by RTMV-style datasets to pre-prune the acceleration structure."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def create_pointcloud_from_images(rgbs: List[np.ndarray], masks: List[np.ndarray],
                                  rays_list, depths: List[np.ndarray]
                                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Unproject per-view depth maps along their rays into a colored world pointcloud
    (reference pointcloud/conversions.py): keep pixels where mask > 0."""
    pts, colors = [], []
    for rgb, mask, rays, depth in zip(rgbs, masks, rays_list, depths):
        m = np.asarray(mask).reshape(-1) > 0.5
        d = np.asarray(depth).reshape(-1, 1)
        o = np.asarray(rays.origins).reshape(-1, 3)
        v = np.asarray(rays.dirs).reshape(-1, 3)
        p = o + v * d
        pts.append(p[m])
        colors.append(np.asarray(rgb).reshape(-1, 3)[m])
    return np.concatenate(pts).astype(np.float32), np.concatenate(colors).astype(np.float32)


def normalize_pointcloud(coords: np.ndarray, return_scale: bool = False):
    """Center + scale a pointcloud to [-1,1] (reference pointcloud/processing.py)."""
    coords = np.asarray(coords, dtype=np.float32)
    center = (coords.max(0) + coords.min(0)) / 2.0
    out = coords - center
    scale = np.abs(out).max() * (1.0 / 0.9)
    out = out / scale
    if return_scale:
        return out, center, scale
    return out
