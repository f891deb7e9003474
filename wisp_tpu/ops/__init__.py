from wisp_tpu.ops import grid, geometric, differential, spc, image, mesh, sdf, raygen, shaders, pointcloud
