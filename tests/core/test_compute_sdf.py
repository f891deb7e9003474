"""compute_sdf sign correctness: angle-weighted pseudonormals vs a winding-number oracle.

The reference vendors a 1.4k-LoC CUDA pseudonormal kernel (mesh2sdf_kernel.cu) precisely
because the naive nearest-face sign rule breaks at edge/vertex-nearest queries. These tests
stress exactly those features: cube corners/edges, a thin slab's midplane, a non-convex
L-prism's concave edge, and randomized near-vertex queries — all checked against the
generalized winding number (exact for watertight meshes)."""

import numpy as np
import pytest


def winding_number(v, f, pts):
    """Generalized winding number via Van Oosterom–Strackee solid angles (float64)."""
    v = np.asarray(v, np.float64)
    pts = np.asarray(pts, np.float64)
    a = v[f[:, 0]][None] - pts[:, None]      # [P, T, 3]
    b = v[f[:, 1]][None] - pts[:, None]
    c = v[f[:, 2]][None] - pts[:, None]
    la = np.linalg.norm(a, axis=-1)
    lb = np.linalg.norm(b, axis=-1)
    lc = np.linalg.norm(c, axis=-1)
    num = np.sum(a * np.cross(b, c), axis=-1)
    den = (la * lb * lc + np.sum(a * b, -1) * lc + np.sum(a * c, -1) * lb
           + np.sum(b * c, -1) * la)
    return np.sum(2.0 * np.arctan2(num, den), axis=-1) / (4.0 * np.pi)


def _l_prism():
    """Watertight non-convex L-shaped prism with a concave edge along z."""
    outline = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], np.float32)
    n = len(outline)
    bot = np.concatenate([outline, np.full((n, 1), -0.5, np.float32)], -1)
    top = np.concatenate([outline, np.full((n, 1), 0.5, np.float32)], -1)
    v = np.concatenate([bot, top], 0)
    # caps (fan triangulations of the L polygon, consistent with CCW outline)
    cap = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 5]], np.int32)
    f_bot = cap[:, ::-1]                       # bottom faces point -z
    f_top = cap + n                            # top faces point +z
    sides = []
    for i in range(n):
        j = (i + 1) % n
        sides.append([i, j, j + n])
        sides.append([i, j + n, i + n])
    f = np.concatenate([f_bot, f_top, np.asarray(sides, np.int32)], 0)
    return v, f


class TestComputeSDFSign:
    def test_cube_corner_and_edge_queries(self):
        from wisp_tpu.ops.mesh import make_box_mesh
        from wisp_tpu.ops.mesh.compute_sdf import compute_sdf
        v, f = make_box_mesh((0.5, 0.5, 0.5))
        # points whose closest feature is a corner or an edge, inside and outside
        pts = np.array([
            [0.6, 0.6, 0.6], [0.7, 0.55, 0.55], [-0.6, 0.6, -0.6],   # corner-nearest out
            [0.55, 0.55, 0.0], [0.0, -0.6, 0.6],                      # edge-nearest out
            [0.45, 0.45, 0.45], [0.49, 0.49, 0.0], [0.0, 0.0, 0.0],   # inside
        ], np.float32)
        sdf = compute_sdf(v, f, pts)
        wn = winding_number(v, f, pts)
        np.testing.assert_array_equal(sdf < 0, wn > 0.5)
        # magnitudes: corner point distance = sqrt(3)*0.1
        assert sdf[0] == pytest.approx(np.sqrt(3) * 0.1, abs=1e-5)
        assert sdf[7] == pytest.approx(-0.5, abs=1e-5)

    def test_thin_slab_midplane_and_edges(self):
        from wisp_tpu.ops.mesh import make_box_mesh
        from wisp_tpu.ops.mesh.compute_sdf import compute_sdf
        h = 0.02
        v, f = make_box_mesh((1.0, 1.0, h))
        pts = np.array([
            [0.0, 0.0, 0.0],          # midplane: equidistant to top/bottom -> inside
            [0.5, -0.3, 0.0],         # midplane elsewhere
            [0.0, 0.0, h + 1e-3],     # just above the top face
            [1.0 + 1e-3, 0.0, 0.0],   # just outside a side face at the midplane
            [0.999, 0.999, 0.0],      # inside near the vertical edge
        ], np.float32)
        sdf = compute_sdf(v, f, pts)
        wn = winding_number(v, f, pts)
        np.testing.assert_array_equal(sdf < 0, wn > 0.5)
        assert sdf[0] == pytest.approx(-h, abs=1e-5)

    def test_concave_edge_of_l_prism(self):
        from wisp_tpu.ops.mesh.compute_sdf import compute_sdf
        v, f = _l_prism()
        # the concave edge runs along (1, 1, z): the notch quadrant x>1, y>1 is OUTSIDE
        pts = np.array([
            [1.05, 1.05, 0.0],        # in the notch, 0.05 from both inner walls
            [1.0 + 1e-4, 1.0 + 1e-4, 0.0],
            [0.95, 0.95, 0.0],        # inside, nearest feature = concave edge
            [1.2, 1.2, 0.0],
            [1.05, 1.05, 0.49],       # in the notch near the top
        ], np.float32)
        sdf = compute_sdf(v, f, pts)
        wn = winding_number(v, f, pts)
        np.testing.assert_array_equal(sdf < 0, wn > 0.5)
        assert sdf[0] == pytest.approx(0.05, rel=1e-3)

    def test_randomized_near_vertex_queries_match_winding_number(self):
        """Perturbations straight off mesh vertices — the argmin-tie-break minefield."""
        from wisp_tpu.ops.mesh import make_sphere_mesh
        from wisp_tpu.ops.mesh.compute_sdf import compute_sdf
        v, f = make_sphere_mesh(0.7, subdivisions=2)
        rng = np.random.default_rng(0)
        base = v[rng.integers(0, len(v), 256)]
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = (base + d * rng.uniform(1e-4, 0.05, (256, 1))).astype(np.float32)
        sdf = compute_sdf(v, f, pts)
        wn = winding_number(v, f, pts)
        np.testing.assert_array_equal(sdf < 0, wn > 0.5)

    def test_tri_chunked_path_matches_unchunked(self):
        from wisp_tpu.ops.mesh import make_sphere_mesh
        from wisp_tpu.ops.mesh.compute_sdf import compute_sdf
        v, f = make_sphere_mesh(0.7, subdivisions=2)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
        a = compute_sdf(v, f, pts)
        b = compute_sdf(v, f, pts, tri_chunk=37)
        np.testing.assert_allclose(a, b, atol=1e-6)
