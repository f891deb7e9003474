"""End-to-end NGLOD SDF test: train a NeuralSDF on a procedural icosphere and check
volumetric IoU (the reference validates SDF training by IoU, sdf_trainer.py:156-190;
the sphere's analytic SDF makes this a strict correctness check)."""


def test_nglod_octree_sphere_iou():
    from app.nglod.main_nglod import main
    result = main(argv=[
        # reference nglod_octree.yaml hyperparameters (Adam 1e-3 eps 1e-15, grid weight 1.0,
        # feature_std 0.01, position_input) scaled down to the CPU test budget
        "--trainer.max-epochs", "20",
        "--trainer.exp-name", "test-nglod",
        "--trainer.valid-every", "-1",
        "--trainer.render-every", "-1",
        "--trainer.save-every", "-1",
        "--trainer.batch-size", "2048",
        "--trainer.optimizer.lr", "0.001",
        "--trainer.optimizer.eps", "1e-15",
        "--trainer.grid-lr-weight", "1.0",
        "--tracker.tensorboard", "false",
        "--blas-level", "4",
        "--grid.constructor", "OctreeGrid",
        "--grid.feature-dim", "16",
        "--grid.num-lods", "3",
        "--grid.multiscale-type", "sum",
        "--grid.feature-std", "0.01",
        "--dataset.constructor", "OctreeSampledSDFDataset",
        "--dataset.num-samples", "60000",
        "--dataset.samples-per-voxel", "8",
        "--nef.hidden-dim", "128",
        "--nef.num-layers", "1",
        "--nef.position-input", "true",
    ])
    # volumetric IoU inside occupied cells: a correct stack reaches ~0.99; the narrowband
    # sample IoU (reference's metric) is also reported but is sign-noise-limited ~0.6.
    assert result["volumetric_iou"] > 0.97, f"IoU too low: {result}"


def test_sdf_sphere_tracer_renders():
    """Sphere-trace a trained-enough SDF and check hit mask sanity (counterpart of the
    reference's render_snapshot path through PackedSDFTracer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.core import Rays
    from wisp_tpu.models.nefs.base_nef import BaseNeuralField
    from wisp_tpu.tracers.packed_sdf_tracer import PackedSDFTracer

    # analytic sphere SDF nef (no training needed to test the tracer)
    class SphereNef(BaseNeuralField):
        def __init__(self, grid):
            self.grid = grid
            super().__init__()

        def register_forward_functions(self):
            self._register_forward_function(self.sdf, ["sdf"])

        def sdf(self, coords, lod_idx=None):
            return (jnp.linalg.norm(coords, axis=-1, keepdims=True) - 0.5)

    from wisp_tpu.ops.spc.core import quantize_points
    from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface

    v, f = make_sphere_mesh(radius=0.5, subdivisions=3)
    samples = sample_surface(v, f, 200000)
    blas = OctreeAS.from_quantized_points(quantize_points(samples, 4), 4)

    class _Grid:
        def __init__(self, blas):
            self.blas = blas
            self.num_lods = 1
            self.active_lods = (4,)

        def raytrace(self, rays, level=None, with_exit=False):
            return self.blas.raytrace(rays, level=level)

    nef = SphereNef(_Grid(blas))
    tracer = PackedSDFTracer(num_steps=64, step_size=0.8, min_dis=1e-3)

    n = 64
    ys = np.linspace(-0.9, 0.9, n, dtype=np.float32)
    origins = np.stack([ys, np.zeros(n, np.float32), np.full(n, -3.0, np.float32)], -1)
    dirs = np.broadcast_to(np.asarray([0.0, 0.0, 1.0], np.float32), (n, 3))
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 10.0)

    rb = tracer(nef, rays)
    hit = np.asarray(rb.hit)[:, 0]
    depth = np.asarray(rb.depth)[:, 0]
    # rays with |y| < 0.5 hit the sphere; others miss
    assert hit[np.abs(ys) < 0.4].all(), "central rays must hit"
    assert not hit[np.abs(ys) > 0.55].any(), "outer rays must miss"
    # central ray depth ≈ 3 - 0.5 = 2.5
    center = np.argmin(np.abs(ys))
    assert abs(depth[center] - 2.5) < 0.02
    # normals at hit points point outward (towards -z for front hits)
    normal = np.asarray(rb.normal)[center]
    assert normal[2] < -0.9
