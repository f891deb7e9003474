"""Debug visualization helpers (reference wisp/utils/debug.py:16-63 wraps polyscope).

Polyscope needs a display; on TPU pods the same role — dumping point clouds / SDF samples for
inspection — is served by writing standard PLY files any local viewer opens, keeping the
PsDebugger register/show API shape."""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

log = logging.getLogger(__name__)


def write_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None) -> None:
    pts = np.asarray(points, dtype=np.float32)
    cols = None if colors is None else np.clip(np.asarray(colors) * 255, 0, 255).astype(
        np.uint8)
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(pts)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        if cols is not None:
            fh.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fh.write("end_header\n")
        for i, p in enumerate(pts):
            line = f"{p[0]} {p[1]} {p[2]}"
            if cols is not None:
                line += f" {cols[i][0]} {cols[i][1]} {cols[i][2]}"
            fh.write(line + "\n")


class PsDebugger:
    """Accumulates named point clouds and dumps them for external viewing
    (reference PsDebugger.register_point_cloud/add_*_quantity/show)."""

    def __init__(self, out_dir: str = "/tmp/wisp_debug"):
        self.out_dir = out_dir
        self._clouds: Dict[str, dict] = {}
        os.makedirs(out_dir, exist_ok=True)

    def register_point_cloud(self, name: str, points) -> None:
        self._clouds[name] = {"points": np.asarray(points), "colors": None}

    def add_color_quantity(self, name: str, quantity_name: str, colors) -> None:
        if name in self._clouds:
            self._clouds[name]["colors"] = np.asarray(colors)

    def add_scalar_quantity(self, name: str, quantity_name: str, scalars) -> None:
        if name in self._clouds:
            s = np.asarray(scalars).reshape(-1)
            lo, hi = s.min(), s.max()
            t = (s - lo) / max(hi - lo, 1e-9)
            self._clouds[name]["colors"] = np.stack([t, 0.2 + 0 * t, 1.0 - t], -1)

    def show(self) -> None:
        for name, data in self._clouds.items():
            path = os.path.join(self.out_dir, f"{name}.ply")
            write_ply(path, data["points"], data["colors"])
            log.info(f"debug cloud written: {path}")
