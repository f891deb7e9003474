"""Mesh I/O: OBJ loading + procedural test meshes.

Counterpart of reference wisp/ops/mesh/load_obj.py (which wraps tinyobjloader, unavailable
here — a direct parser handles the v/vt/vn/f subset plus per-face materials). Procedural
sphere/box generators stand in for external mesh assets in tests (no .obj files ship with
this environment).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)


def load_obj(path: str, load_materials: bool = False):
    """Parse an OBJ file → (vertices [V,3] f32, faces [F,3] i32[, texv, texf, mats]).

    Quads and n-gons are fan-triangulated. With ``load_materials``, texture coords +
    per-face material ids are returned too (reference load_obj returns the same bundle).
    """
    vertices, faces = [], []
    texcoords, texfaces = [], []
    materials: Dict[str, dict] = {}
    face_mats = []
    cur_mat = -1
    mat_names = []

    with open(path) as fh:
        for line in fh:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                vertices.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                texcoords.append([float(x) for x in parts[1:3]])
            elif tag == "usemtl" and load_materials:
                name = parts[1]
                if name not in mat_names:
                    mat_names.append(name)
                cur_mat = mat_names.index(name)
            elif tag == "f":
                idx = []
                tidx = []
                for p in parts[1:]:
                    comps = p.split("/")
                    idx.append(int(comps[0]) - 1 if int(comps[0]) > 0
                               else len(vertices) + int(comps[0]))
                    if len(comps) > 1 and comps[1]:
                        tidx.append(int(comps[1]) - 1)
                for i in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[i], idx[i + 1]])
                    face_mats.append(cur_mat)
                    if tidx:
                        texfaces.append([tidx[0], tidx[i], tidx[i + 1]])

    v = np.asarray(vertices, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int32)
    if load_materials:
        tv = np.asarray(texcoords, dtype=np.float32) if texcoords else None
        tf = np.asarray(texfaces, dtype=np.int32) if texfaces else None
        return v, f, tv, tf, np.asarray(face_mats, dtype=np.int32), mat_names
    return v, f


def make_sphere_mesh(radius: float = 0.7, subdivisions: int = 3
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Icosphere test mesh (known analytic SDF: |x| - radius)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.asarray([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdivisions):
        edge_mid: Dict[Tuple[int, int], int] = {}
        new_faces = []
        verts_list = verts.tolist()

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (np.asarray(verts_list[a]) + np.asarray(verts_list[b])) / 2.0
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts_list)
                verts_list.append(m.tolist())
            return edge_mid[key]

        for tri in faces:
            a, b, c = (int(x) for x in tri)
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, dtype=np.int64)

    return (verts * radius).astype(np.float32), faces.astype(np.int32)


def make_box_mesh(half_extents=(0.5, 0.5, 0.5)) -> Tuple[np.ndarray, np.ndarray]:
    hx, hy, hz = half_extents
    v = np.asarray([
        [-hx, -hy, -hz], [hx, -hy, -hz], [hx, hy, -hz], [-hx, hy, -hz],
        [-hx, -hy, hz], [hx, -hy, hz], [hx, hy, hz], [-hx, hy, hz],
    ], dtype=np.float32)
    f = np.asarray([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ], dtype=np.int32)
    return v, f


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as fh:
        for v in vertices:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
