"""AABB wireframe layer (reference wisp/gfx/datalayers/aabb_datalayers.py:18)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from wisp_tpu.core.colors import soft_blue
from wisp_tpu.core.primitives import PrimitivesPack
from wisp_tpu.gfx.datalayers.datalayers import Datalayers
from wisp_tpu.gfx.datalayers.octree_datalayers import _CELL_EDGES


class AABBDatalayers(Datalayers):
    def needs_redraw(self) -> bool:
        return True

    def regenerate_data_layers(self, lo=(-1.0, -1.0, -1.0), hi=(1.0, 1.0, 1.0),
                               color=soft_blue) -> Dict[str, PrimitivesPack]:
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        corners = np.stack([np.where([dx, dy, dz], hi, lo)
                            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)])
        pack = PrimitivesPack()
        for a, b in _CELL_EDGES:
            pack.add_lines(corners[a][None], corners[b][None], color)
        return {"AABB": pack}
