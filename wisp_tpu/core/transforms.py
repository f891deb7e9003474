"""ObjectTransform — per-object model matrix with TRS ops.

Counterpart of the reference ObjectTransform (wisp/core/transforms.py:19): a 4x4 model matrix
used by the scene graph / TLAS to place objects in world space; rays are transformed by the
inverse model matrix before tracing (reference render_core.py:511-541).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ObjectTransform:
    def __init__(self, matrix=None, dtype=jnp.float32):
        self.dtype = dtype
        self._matrix = (jnp.eye(4, dtype=dtype) if matrix is None
                        else jnp.asarray(matrix, dtype=dtype))

    def model_matrix(self):
        """Object → world, [4,4]."""
        return self._matrix

    def inv_model_matrix(self):
        """World → object, [4,4]."""
        return jnp.linalg.inv(self._matrix)

    # -- TRS ops ------------------------------------------------------------------------------
    def translate(self, t) -> "ObjectTransform":
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = np.asarray(t)
        return ObjectTransform(jnp.asarray(m) @ self._matrix, self.dtype)

    def scale(self, s) -> "ObjectTransform":
        s = np.broadcast_to(np.asarray(s, dtype=np.float32), (3,))
        m = np.diag(np.concatenate([s, [1.0]]).astype(np.float32))
        return ObjectTransform(jnp.asarray(m) @ self._matrix, self.dtype)

    def rotate(self, axis: str, angle_rad: float) -> "ObjectTransform":
        c, s = np.cos(angle_rad), np.sin(angle_rad)
        m = np.eye(4, dtype=np.float32)
        if axis == "x":
            m[1:3, 1:3] = [[c, -s], [s, c]]
        elif axis == "y":
            m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        elif axis == "z":
            m[0:2, 0:2] = [[c, -s], [s, c]]
        else:
            raise ValueError(f"unknown axis {axis!r}")
        return ObjectTransform(jnp.asarray(m) @ self._matrix, self.dtype)

    def transform_points(self, points):
        """Apply to [N,3] points."""
        homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
        out = homo @ self._matrix.T
        return out[..., :3]

    def transform_vectors(self, vecs):
        """Apply rotation/scale only to [N,3] direction vectors."""
        return vecs @ self._matrix[:3, :3].T

    def __matmul__(self, other: "ObjectTransform") -> "ObjectTransform":
        return ObjectTransform(self._matrix @ other._matrix, self.dtype)

    def __repr__(self):
        return f"ObjectTransform({np.asarray(self._matrix)})"
