"""OfflineRenderer + save/load pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.kernel

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.models.nefs.spc_field import SPCField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
from wisp_tpu.ops.spc import pointcloud_to_octree
from wisp_tpu.tracers import PackedSPCTracer
from wisp_tpu.trainers.tracker.offline_renderer import OfflineRenderer


@pytest.fixture(scope="module")
def spc_pipeline():
    v, f = make_sphere_mesh(radius=0.6, subdivisions=2)
    samples = sample_surface(v, f, 100000)
    colors = (samples + 1.0) / 2.0
    codes_per_level, cell_colors = pointcloud_to_octree(samples, 5, attributes=colors)
    blas = OctreeAS(codes_per_level)
    return Pipeline(nef=SPCField(blas=blas, colors=cell_colors), tracer=PackedSPCTracer())


class TestOfflineRenderer:
    def test_render_lookat_hits_sphere(self, spc_pipeline):
        r = OfflineRenderer(render_res=(64, 64))
        rb = r.render_lookat(spc_pipeline, f=(0.0, 0.0, -3.0), t=(0.0, 0.0, 0.0), fov=30.0)
        assert rb.rgb.shape == (64, 64, 3)
        hit = np.asarray(rb.hit)
        assert hit[28:36, 28:36].all()          # center hits the sphere
        assert not hit[0:4, 0:4].any()          # corners miss
        # SPC colors are position-derived → center front should differ from edges
        assert np.asarray(rb.depth)[32, 32, 0] == pytest.approx(2.4, abs=0.15)

    def test_render_360_frames(self, spc_pipeline):
        r = OfflineRenderer(render_res=(32, 32))
        frames = r.render_360(spc_pipeline, num_angles=3, radius=3.0)
        assert len(frames) == 3
        assert frames[0].shape == (32, 32, 3)
        assert frames[0].dtype == np.uint8

    def test_render_batched_chunks_match(self, spc_pipeline):
        full = OfflineRenderer(render_res=(32, 32), render_batch=0)
        chunked = OfflineRenderer(render_res=(32, 32), render_batch=256)
        rb_a = full.render_lookat(spc_pipeline, f=(0, 0, -3.0))
        rb_b = chunked.render_lookat(spc_pipeline, f=(0, 0, -3.0))
        np.testing.assert_allclose(np.asarray(rb_a.rgb), np.asarray(rb_b.rgb), atol=1e-6)


class TestPipelineSaveLoad:
    def test_full_pipeline_roundtrip(self, spc_pipeline, tmp_path):
        """model_format='full' pickle of the whole pipeline pytree reloads and renders
        identically (reference --pretrained path, main_nerf.py:86-103)."""
        import pickle
        path = tmp_path / "model.ckpt"
        with open(path, "wb") as fh:
            pickle.dump(jax.device_get(spc_pipeline), fh)
        from wisp_tpu.trainers import load_pipeline
        loaded = load_pipeline(str(path))
        r = OfflineRenderer(render_res=(16, 16))
        rb_a = r.render_lookat(spc_pipeline, f=(0, 0, -3.0))
        rb_b = OfflineRenderer(render_res=(16, 16)).render_lookat(loaded, f=(0, 0, -3.0))
        np.testing.assert_allclose(np.asarray(rb_a.rgb), np.asarray(rb_b.rgb), atol=1e-6)
