from wisp_tpu.accelstructs.base_as import (BaseAS, ASQueryResults, ASRaytraceResults,
                                           ASRaymarchResults)
from wisp_tpu.accelstructs.octree_as import OctreeAS, MeshExtent
from wisp_tpu.accelstructs.aabb_as import AxisAlignedBBoxAS
