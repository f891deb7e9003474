"""Camera frustum wireframes (reference wisp/gfx/datalayers/camera_datalayers.py:17)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from wisp_tpu.core.colors import lime_green
from wisp_tpu.core.primitives import PrimitivesPack
from wisp_tpu.gfx.datalayers.datalayers import Datalayers


class CameraDatalayers(Datalayers):
    def needs_redraw(self) -> bool:
        return True

    def regenerate_data_layers(self, cameras: Dict, near_scale: float = 0.2,
                               far_scale: float = 0.6, color=lime_green
                               ) -> Dict[str, PrimitivesPack]:
        pack = PrimitivesPack()
        for name, cam in cameras.items():
            c2w = cam.cam_to_world
            eye = c2w[:3, 3]
            right, up, fwd = c2w[:3, 0], c2w[:3, 1], -c2w[:3, 2]
            half_w = np.tan(cam.fov / 2) if cam.fov else 0.5
            half_h = half_w * (cam.height / cam.width)
            for s in (near_scale, far_scale):
                quad = [eye + s * (fwd + sx * half_w * right + sy * half_h * up)
                        for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))]
                for i in range(4):
                    pack.add_lines(quad[i][None], quad[(i + 1) % 4][None], color)
                    if s == far_scale:
                        pack.add_lines(eye[None], quad[i][None], color)
        return {"Cameras": pack}
