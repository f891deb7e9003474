"""Native C++ SPC builder vs numpy fallback equivalence (kernel-vs-reference style)."""

import numpy as np
import pytest

from wisp_tpu import csrc
from wisp_tpu.ops.spc.core import (points_to_morton, morton_to_points, quantize_points,
                                   dilate_points)

needs_native = pytest.mark.skipif(not csrc.available(), reason="no native builder")


@needs_native
class TestNativeSPC:
    def test_morton_roundtrip_matches_numpy(self, rng):
        pts = rng.integers(0, 1024, (10000, 3)).astype(np.int32)
        np.testing.assert_array_equal(csrc.morton_encode(pts), points_to_morton(pts))
        codes = csrc.morton_encode(pts)
        np.testing.assert_array_equal(csrc.morton_decode(codes), morton_to_points(codes))

    def test_quantize_and_unique(self, rng):
        coords = (rng.random((50000, 3)) * 2 - 1).astype(np.float32)
        native = csrc.quantize_and_unique(coords, 6)
        expected = np.unique(points_to_morton(quantize_points(coords, 6)))
        np.testing.assert_array_equal(native, expected)

    def test_parent_level(self, rng):
        pts = rng.integers(0, 64, (1000, 3)).astype(np.int32)
        codes = np.unique(points_to_morton(pts))
        np.testing.assert_array_equal(csrc.parent_level(codes),
                                      np.unique(codes >> np.uint64(3)))

    def test_occupancy_bitfield(self, rng):
        level = 4
        res = 2 ** level
        pts = rng.integers(0, res, (200, 3)).astype(np.int32)
        codes = np.unique(points_to_morton(pts))
        occ = csrc.fill_occupancy(codes, level)
        dec = csrc.morton_decode(codes)
        flat = (dec[:, 0].astype(np.int64) * res + dec[:, 1]) * res + dec[:, 2]
        expected = np.zeros(res ** 3, dtype=bool)
        expected[flat] = True
        np.testing.assert_array_equal(occ, expected)

    def test_dilate_matches_numpy(self, rng):
        level = 4
        pts = rng.integers(0, 2 ** level, (50, 3)).astype(np.int32)
        codes = np.unique(points_to_morton(pts))
        native = csrc.dilate(codes, level)
        expected = np.unique(points_to_morton(
            dilate_points(morton_to_points(codes), level)))
        np.testing.assert_array_equal(native, expected)
