"""Latent-NeRF demo (counterpart of reference examples/latent_nerf/main_demo.py): train the
custom FunnyNeuralField briefly and render both the rgb channel and the custom latent channel
through the standard tracer — demonstrating channel-based extension end to end."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import jax
import jax.numpy as jnp
import numpy as np

from examples.latent_nerf.funny_neural_field import FunnyNeuralField
from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers import PackedRFTracer


def main(render_res: int = 128, out_dir: str = "/tmp/latent_nerf"):
    blas = OctreeAS.make_dense(4)
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=4,
                                   codebook_bitwidth=10, min_grid_res=8, max_grid_res=64,
                                   multiscale_type="cat", feature_std=0.01,
                                   key=jax.random.PRNGKey(0))
    nef = FunnyNeuralField(grid=grid, key=jax.random.PRNGKey(1))
    pipeline = Pipeline(nef=nef, tracer=PackedRFTracer(raymarch_type="ray", num_steps=64))

    ys, xs = np.mgrid[-1:1:render_res * 1j, -1:1:render_res * 1j].astype(np.float32)
    origins = np.stack([xs, ys, np.full_like(xs, -3.0)], -1).reshape(-1, 3)
    dirs = np.broadcast_to(np.asarray([0, 0, 1.0], np.float32), origins.shape)
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 6.0)

    rb = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "color_feature"]))(pipeline, rays)
    os.makedirs(out_dir, exist_ok=True)
    from wisp_tpu.ops.image.io import write_png
    write_png(os.path.join(out_dir, "rgb.png"),
              np.asarray(rb.rgb).reshape(render_res, render_res, 3))
    write_png(os.path.join(out_dir, "latent.png"),
              np.asarray(rb.color_feature).reshape(render_res, render_res, 3))
    print(f"wrote rgb.png + latent.png to {out_dir}")
    return rb


if __name__ == "__main__":
    main()
