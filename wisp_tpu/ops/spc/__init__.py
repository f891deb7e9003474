from wisp_tpu.ops.spc.core import (quantize_points, quantize_points_jnp, points_to_morton,
                                   morton_to_points, morton3d, build_level_table,
                                   points_to_corners, dilate_points, make_dual,
                                   MAX_OCTREE_LEVEL)
from wisp_tpu.ops.spc.constructors import create_dense_octree, make_trilinear_spc
from wisp_tpu.ops.spc.conversions import (pointcloud_to_octree, mesh_to_octree, mesh_to_spc,
                                          octree_to_spc)
from wisp_tpu.ops.spc.sampling import (sample_spc, sample_from_depth_intervals,
                                       expand_pack_boundary)
from wisp_tpu.ops.spc.metrics import total_variation
