from wisp_tpu.ops.mesh.io import (load_obj, make_sphere_mesh, make_box_mesh, write_obj,
                                  write_mtl)
from wisp_tpu.ops.mesh.ops import (normalize, per_face_normals, area_weighted_distribution,
                                   random_face, sample_surface, sample_near_surface,
                                   sample_uniform, point_sample, barycentric_coordinates,
                                   closest_point_on_triangle)
from wisp_tpu.ops.mesh.compute_sdf import compute_sdf, closest_point
from wisp_tpu.ops.mesh.closest_tex import closest_tex, sample_tex
