from wisp_tpu.ops.raygen.raygen import (generate_centered_pixel_coords, generate_pinhole_rays,
                                        generate_ortho_rays, generate_default_grid)
