"""Gizmo painters — world grid, axes, primitive batches.

Counterpart of reference wisp/renderer/gizmos/ogl/ (glumpy GL shader painters, ~400 LoC).
No GL exists on TPU pods, so gizmos draw into the composited frame with a small software
rasterizer (numpy line drawing after projecting PrimitivesPack vertices through the camera) —
enough for debug overlays in disk/jupyter presenters.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.primitives import PrimitivesPack


def project_points(camera: Camera, points: np.ndarray):
    """World → pixel coords + in-front mask."""
    view = camera.view_matrix
    pts_h = np.concatenate([points, np.ones_like(points[:, :1])], axis=-1)
    cam = pts_h @ view.T
    z = -cam[:, 2]
    in_front = z > 1e-6
    zs = np.where(in_front, z, 1.0)
    x = cam[:, 0] / zs * camera.focal_x + camera.width * 0.5 + camera.x0
    y = -cam[:, 1] / zs * camera.focal_y + camera.height * 0.5 + camera.y0
    return np.stack([x, y], -1), in_front


def _draw_line(img, p0, p1, color):
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    n = min(n, 4 * max(h, w))
    ts = np.linspace(0.0, 1.0, n + 1)
    xs = np.clip((p0[0] + (p1[0] - p0[0]) * ts).astype(int), 0, w - 1)
    ys = np.clip((p0[1] + (p1[1] - p0[1]) * ts).astype(int), 0, h - 1)
    valid = ((p0[0] + (p1[0] - p0[0]) * ts) >= 0) & ((p0[0] + (p1[0] - p0[0]) * ts) < w) & \
            ((p0[1] + (p1[1] - p0[1]) * ts) >= 0) & ((p0[1] + (p1[1] - p0[1]) * ts) < h)
    img[ys[valid], xs[valid]] = color[:3]


class PrimitivesPainter:
    """Rasterize PrimitivesPack lines/points over a frame
    (reference gizmos PrimitivesPainter)."""

    def paint(self, frame: np.ndarray, camera: Camera, pack: PrimitivesPack) -> np.ndarray:
        out = np.array(frame, copy=True)
        lines = pack.lines
        if lines is not None:
            starts, ends, colors = lines
            p0, f0 = project_points(camera, starts)
            p1, f1 = project_points(camera, ends)
            for i in range(len(starts)):
                if f0[i] and f1[i]:
                    _draw_line(out, p0[i], p1[i], colors[i])
        points = pack.points
        if points is not None:
            pos, colors = points
            pp, fp = project_points(camera, pos)
            h, w = out.shape[:2]
            xi = np.clip(pp[:, 0].astype(int), 0, w - 1)
            yi = np.clip(pp[:, 1].astype(int), 0, h - 1)
            ok = fp & (pp[:, 0] >= 0) & (pp[:, 0] < w) & (pp[:, 1] >= 0) & (pp[:, 1] < h)
            out[yi[ok], xi[ok]] = colors[ok][:, :3]
        return out


class WorldGrid:
    """XZ ground-plane grid gizmo (reference gizmos/ogl WorldGrid)."""

    def __init__(self, size: float = 2.0, divisions: int = 10,
                 color=(0.4, 0.4, 0.4)):
        pack = PrimitivesPack()
        ticks = np.linspace(-size, size, divisions + 1)
        for t in ticks:
            pack.add_lines(np.asarray([[t, 0.0, -size]]), np.asarray([[t, 0.0, size]]),
                           color)
            pack.add_lines(np.asarray([[-size, 0.0, t]]), np.asarray([[size, 0.0, t]]),
                           color)
        self.pack = pack

    def paint(self, frame, camera):
        return PrimitivesPainter().paint(frame, camera, self.pack)


class AxisPainter:
    """RGB world-axes gizmo (reference gizmos/ogl AxisPainter)."""

    def __init__(self, length: float = 1.0):
        pack = PrimitivesPack()
        o = np.zeros((1, 3), np.float32)
        pack.add_lines(o, np.asarray([[length, 0, 0]]), (1.0, 0.2, 0.2))
        pack.add_lines(o, np.asarray([[0, length, 0]]), (0.2, 1.0, 0.2))
        pack.add_lines(o, np.asarray([[0, 0, length]]), (0.2, 0.4, 1.0))
        self.pack = pack

    def paint(self, frame, camera):
        return PrimitivesPainter().paint(frame, camera, self.pack)
