"""Matcap shading (reference wisp/ops/shaders/matcap.py:20-52): sample a material-capture
texture by the spherical-envmap UV of (view dir, normal)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wisp_tpu.ops.geometric import spherical_envmap


def matcap_sampler(path: str, interpolate: bool = True):
    """Load a matcap texture and return a sampler fn uv[N,2]∈[0,1] → rgb[N,3]
    (reference matcap.py:20-37)."""
    from wisp_tpu.ops.image.io import load_rgb
    tex = jnp.asarray(load_rgb(path))
    h, w = tex.shape[:2]

    def sample(uv):
        x = jnp.clip(uv[..., 0] * (w - 1), 0, w - 1)
        y = jnp.clip(uv[..., 1] * (h - 1), 0, h - 1)
        if interpolate:
            x0, y0 = jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32)
            x1, y1 = jnp.clip(x0 + 1, 0, w - 1), jnp.clip(y0 + 1, 0, h - 1)
            fx, fy = (x - x0)[..., None], (y - y0)[..., None]
            return (tex[y0, x0] * (1 - fx) * (1 - fy) + tex[y0, x1] * fx * (1 - fy)
                    + tex[y1, x0] * (1 - fx) * fy + tex[y1, x1] * fx * fy)
        return tex[y.astype(jnp.int32), x.astype(jnp.int32)]

    return sample


def matcap_shader(ray_d, normal, matcap_path: str):
    """Shade hit points with a matcap (reference matcap.py:40-52)."""
    uv = spherical_envmap(ray_d, normal)
    return matcap_sampler(matcap_path)(uv)
