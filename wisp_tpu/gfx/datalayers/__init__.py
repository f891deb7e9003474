from wisp_tpu.gfx.datalayers.datalayers import Datalayers
from wisp_tpu.gfx.datalayers.octree_datalayers import OctreeDatalayers
from wisp_tpu.gfx.datalayers.aabb_datalayers import AABBDatalayers
from wisp_tpu.gfx.datalayers.camera_datalayers import CameraDatalayers
