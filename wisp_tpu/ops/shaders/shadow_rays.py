"""Point-light shadow shading (reference wisp/ops/shaders/shadow_rays.py:17-80): a second
tracer pass from the hit points toward the light; occluded points are darkened."""

from __future__ import annotations

import jax.numpy as jnp

from wisp_tpu.core.rays import Rays


def pointlight_shadow_shader(nef, tracer, xyz, hit, light_pos=(2.0, 2.0, 2.0),
                             shadow_strength: float = 0.5, eps: float = 1e-2):
    """Returns a per-point shadow multiplier in [1-shadow_strength, 1].

    Traces shadow rays from the surface points toward a point light with the same tracer;
    points whose shadow ray re-hits the field before reaching the light are attenuated.
    """
    light = jnp.asarray(light_pos, jnp.float32)
    to_light = light[None, :] - xyz
    dist = jnp.linalg.norm(to_light, axis=-1, keepdims=True)
    dirs = to_light / jnp.maximum(dist, 1e-9)
    origins = xyz + dirs * eps
    shadow_rays = Rays(origins=origins, dirs=dirs, dist_min=0.0, dist_max=10.0)
    rb = tracer(nef, shadow_rays, channels=["hit", "depth"])
    occluded = rb.hit[:, 0] & (rb.depth[:, 0] < dist[:, 0] - 2 * eps)
    mult = jnp.where(occluded & hit, 1.0 - shadow_strength, 1.0)
    return mult[:, None]
