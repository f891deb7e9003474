"""SPC browser (counterpart of reference examples/spc_browser): convert meshes to colored
SPCs and render them with the first-hit PackedSPCTracer through the scene-graph renderer."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.models.nefs.spc_field import SPCField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.ops.spc import pointcloud_to_octree
from wisp_tpu.tracers import PackedSPCTracer


def mesh_to_colored_spc(mesh_path: str = None, level: int = 6):
    """Mesh (or procedural sphere) → colored SPC: surface samples with position-derived
    colors averaged per cell (reference browser converts OBJ dirs)."""
    from wisp_tpu.ops.mesh import load_obj, make_sphere_mesh, normalize, sample_surface
    if mesh_path:
        v, f = load_obj(mesh_path)
    else:
        v, f = make_sphere_mesh(radius=1.0, subdivisions=3)
    v, f = normalize(v, f, "sphere")
    samples = sample_surface(v, f, 500000)
    colors = (samples + 1.0) / 2.0  # position-derived debug colors
    codes_per_level, cell_colors = pointcloud_to_octree(samples, level, attributes=colors)
    blas = OctreeAS(codes_per_level)
    return blas, cell_colors


def main(mesh_path: str = None, out_path: str = "/tmp/spc_browser.png", res: int = 256):
    import jax
    import jax.numpy as jnp
    from wisp_tpu.core import Rays

    blas, cell_colors = mesh_to_colored_spc(mesh_path)
    nef = SPCField(blas=blas, colors=cell_colors)
    pipeline = Pipeline(nef=nef, tracer=PackedSPCTracer())

    ys, xs = np.mgrid[-1:1:res * 1j, -1:1:res * 1j].astype(np.float32)
    origins = np.stack([xs, ys, np.full_like(xs, -3.0)], -1).reshape(-1, 3)
    dirs = np.broadcast_to(np.asarray([0, 0, 1.0], np.float32), origins.shape)
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 6.0)

    rb = jax.jit(lambda p, r: p(rays=r))(pipeline, rays)
    from wisp_tpu.ops.image.io import write_png
    write_png(out_path, np.asarray(rb.rgb).reshape(res, res, 3))
    print(f"wrote {out_path}")
    return rb


if __name__ == "__main__":
    main(mesh_path=sys.argv[1] if len(sys.argv) > 1 else None)
