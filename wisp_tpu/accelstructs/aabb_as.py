"""AxisAlignedBBoxAS — the trivial acceleration structure (reference
wisp/accelstructs/aabb_as.py:14-27): a level-0-dense octree, i.e. the [-1,1]^3 box itself.
Inherits all tracing behavior from OctreeAS's dense path."""

from __future__ import annotations

from wisp_tpu.accelstructs.octree_as import OctreeAS


class AxisAlignedBBoxAS(OctreeAS):
    def __init__(self):
        dense = OctreeAS.make_dense(0)
        self.__dict__.update(dense.__dict__)

    def name(self) -> str:
        return "AABB"

    def public_properties(self) -> dict:
        return {"Bounds": "[-1, 1]^3"}
