"""SPC constructors (reference wisp/ops/spc/constructors.py:14-46)."""

from __future__ import annotations

import numpy as np


def create_dense_octree(level: int):
    """Fully-occupied level tables (reference constructors.py:14-29).
    Dense level l codes are simply arange(8^l) (morton codes of all cells)."""
    return [np.arange(8 ** l, dtype=np.uint64) for l in range(level + 1)]


def make_trilinear_spc(points_per_level):
    """Dual octree + trinkets for trilinear feature interpolation
    (reference constructors.py:31-46)."""
    from wisp_tpu.ops.spc.core import make_dual
    dual_points, trinkets = make_dual(points_per_level)
    return dual_points, trinkets
