"""SPC metrics (reference wisp/ops/spc/metrics.py:12): total variation over octree-cell
corner features."""

from __future__ import annotations

import jax.numpy as jnp


def total_variation(features, trinkets, level: int):
    """Total variation of per-corner features over each cell's opposing corner pairs
    (reference metrics.py:12-40): features [V, F] on dual vertices, trinkets [N, 8].

    Corner order matches points_to_corners (z fastest): opposing pairs along x = (0,4),
    (1,5), (2,6), (3,7); along y = (0,2),(1,3),(4,6),(5,7); along z = (0,1),(2,3),(4,5),(6,7).
    Returns mean squared difference scaled by voxel size.
    """
    res = 2 ** level
    f = features[trinkets]  # [N, 8, F]
    tv_x = jnp.sum((f[:, [0, 1, 2, 3]] - f[:, [4, 5, 6, 7]]) ** 2)
    tv_y = jnp.sum((f[:, [0, 1, 4, 5]] - f[:, [2, 3, 6, 7]]) ** 2)
    tv_z = jnp.sum((f[:, [0, 2, 4, 6]] - f[:, [1, 3, 5, 7]]) ** 2)
    return (tv_x + tv_y + tv_z) * (res ** 2) / trinkets.shape[0]
