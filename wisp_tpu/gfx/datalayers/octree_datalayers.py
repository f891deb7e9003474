"""Octree cell wireframes per LOD (reference wisp/gfx/datalayers/octree_datalayers.py:18)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from wisp_tpu.core.colors import colors_generator
from wisp_tpu.core.primitives import PrimitivesPack
from wisp_tpu.gfx.datalayers.datalayers import Datalayers

_CELL_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


class OctreeDatalayers(Datalayers):
    def __init__(self):
        self._last_id = None

    def needs_redraw(self, blas) -> bool:
        redraw = id(blas) != self._last_id
        self._last_id = id(blas)
        return redraw

    def regenerate_data_layers(self, blas, max_cells_per_level: int = 4096
                               ) -> Dict[str, PrimitivesPack]:
        """One wireframe layer per octree level."""
        layers = {}
        colors = colors_generator()
        for level in range(blas.max_level + 1):
            pts = np.asarray(blas.get_level_points(level))
            if len(pts) > max_cells_per_level:
                pts = pts[np.linspace(0, len(pts) - 1, max_cells_per_level).astype(int)]
            res = 2 ** level
            size = 2.0 / res
            corners = np.stack([pts + np.asarray([dx, dy, dz])
                                for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)], axis=1)
            # corner order here: x fastest → edges table below uses (x,y,z) bit layout
            corners = corners * size - 1.0
            pack = PrimitivesPack()
            color = next(colors)
            starts, ends = [], []
            for a, b in _CELL_EDGES:
                starts.append(corners[:, a])
                ends.append(corners[:, b])
            pack.add_lines(np.concatenate(starts), np.concatenate(ends), color)
            layers[f"Octree LOD{level}"] = pack
        return layers
