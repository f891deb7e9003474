"""PrimitivesPack — batched debug-visualization primitives.

Counterpart of the reference PrimitivesPack (wisp/core/primitives.py:17): accumulates line /
point primitives (used by datalayers: octree wireframes, AABBs, camera frustums) which a viewer
or offline painter can draw. Host-side (numpy) container — these are debug layers, not a compute
path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from wisp_tpu.core.colors import white


class PrimitivesPack:
    def __init__(self):
        self._lines_start: List[np.ndarray] = []
        self._lines_end: List[np.ndarray] = []
        self._lines_color: List[np.ndarray] = []
        self._points_pos: List[np.ndarray] = []
        self._points_color: List[np.ndarray] = []
        self.line_width = 1.0
        self.point_size = 1.0

    def append(self, other: "PrimitivesPack") -> None:
        self._lines_start.extend(other._lines_start)
        self._lines_end.extend(other._lines_end)
        self._lines_color.extend(other._lines_color)
        self._points_pos.extend(other._points_pos)
        self._points_color.extend(other._points_color)

    def add_lines(self, start, end, color=white) -> None:
        """Add a batch of line segments; start/end [N,3], color rgb(a) tuple or [N,3/4]."""
        start = np.atleast_2d(np.asarray(start, dtype=np.float32))
        end = np.atleast_2d(np.asarray(end, dtype=np.float32))
        color = self._expand_color(color, len(start))
        self._lines_start.append(start)
        self._lines_end.append(end)
        self._lines_color.append(color)

    def add_points(self, pos, color=white) -> None:
        pos = np.atleast_2d(np.asarray(pos, dtype=np.float32))
        color = self._expand_color(color, len(pos))
        self._points_pos.append(pos)
        self._points_color.append(color)

    @staticmethod
    def _expand_color(color, n: int) -> np.ndarray:
        c = np.asarray(color, dtype=np.float32)
        if c.ndim == 1:
            if c.shape[0] == 3:
                c = np.concatenate([c, [1.0]])
            c = np.tile(c[None], (n, 1))
        elif c.shape[-1] == 3:
            c = np.concatenate([c, np.ones((len(c), 1), dtype=np.float32)], axis=-1)
        return c

    @property
    def lines(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        if not self._lines_start:
            return None
        return (np.concatenate(self._lines_start),
                np.concatenate(self._lines_end),
                np.concatenate(self._lines_color))

    @property
    def points(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        if not self._points_pos:
            return None
        return np.concatenate(self._points_pos), np.concatenate(self._points_color)

    def __len__(self):
        return sum(len(x) for x in self._lines_start) + sum(len(x) for x in self._points_pos)
