from wisp_tpu.ops import (compaction, differential, geometric, grid, image, mesh,
                          pointcloud, raygen, sdf, shaders, spc)
