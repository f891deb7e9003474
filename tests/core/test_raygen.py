"""Camera + raygen unit tests."""

import numpy as np
import jax.numpy as jnp

from wisp_tpu.core.camera import Camera
from wisp_tpu.ops.raygen import generate_pinhole_rays, generate_ortho_rays


class TestPinholeRaygen:
    def test_center_ray_points_at_target(self):
        cam = Camera.from_args(eye=(0.0, 0.0, -3.0), at=(0.0, 0.0, 0.0),
                               width=64, height=64, fov=np.radians(30.0))
        rays = generate_pinhole_rays(cam)
        d = np.asarray(rays.dirs).reshape(64, 64, 3)
        center = d[32, 32]
        np.testing.assert_allclose(center, [0, 0, 1.0], atol=0.03)
        o = np.asarray(rays.origins)
        np.testing.assert_allclose(o[0], [0, 0, -3.0], atol=1e-5)

    def test_fov_spans_expected_angle(self):
        fov = np.radians(60.0)
        cam = Camera.from_args(eye=(0.0, 0.0, -3.0), at=(0.0, 0.0, 0.0),
                               width=128, height=128, fov=fov)
        rays = generate_pinhole_rays(cam)
        d = np.asarray(rays.dirs).reshape(128, 128, 3)
        left, right = d[64, 0], d[64, -1]
        angle = np.arccos(np.clip(np.dot(left, right), -1, 1))
        assert abs(angle - fov) < np.radians(2.0)

    def test_up_is_image_up(self):
        cam = Camera.from_args(eye=(0.0, 0.0, -3.0), at=(0.0, 0.0, 0.0),
                               width=64, height=64, fov=np.radians(40.0))
        rays = generate_pinhole_rays(cam)
        d = np.asarray(rays.dirs).reshape(64, 64, 3)
        assert d[0, 32][1] > d[-1, 32][1]  # top rows look upward (+y)

    def test_principal_point_offset(self):
        cam = Camera.from_args(eye=(0.0, 0.0, -3.0), at=(0.0, 0.0, 0.0),
                               width=64, height=64, fov=np.radians(30.0), x0=8.0)
        rays = generate_pinhole_rays(cam)
        d = np.asarray(rays.dirs).reshape(64, 64, 3)
        # optical center shifted right → center pixel looks camera-left; with the lookat
        # from -z the camera's right axis is world -x, so the world-space x is positive
        assert d[32, 32][0] > 1e-3


class TestOrthoRaygen:
    def test_parallel_rays(self):
        cam = Camera.from_args(eye=(0.0, 0.0, -3.0), at=(0.0, 0.0, 0.0),
                               width=32, height=32, fov=np.radians(30.0), lens="ortho",
                               fov_distance=1.0)
        rays = generate_ortho_rays(cam)
        d = np.asarray(rays.dirs)
        np.testing.assert_allclose(d, np.broadcast_to([0, 0, 1.0], d.shape), atol=1e-5)
        o = np.asarray(rays.origins).reshape(32, 32, 3)
        assert o[:, :, 0].std() > 0.1  # origins spread across the plane
