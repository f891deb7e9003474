"""Channel blend / normalization function library.

TPU-native counterpart of the reference's channel function kit (wisp/core/channel_fn.py:48-330).
Blend functions combine two aligned channel tensors (e.g. when compositing multiple objects into
one RenderBuffer); normalization functions map raw channel values to [0, 1] for display.
All functions are pure jnp and safe under jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


# ---------------------------------------------------------------------------------------------
# Normalization functions (reference channel_fn.py:48-127)
# ---------------------------------------------------------------------------------------------

def normalize(data, min_val: Optional[float] = None, max_val: Optional[float] = None):
    """Linearly map data to [0, 1] using the given or observed min/max."""
    lo = jnp.min(data) if min_val is None else min_val
    hi = jnp.max(data) if max_val is None else max_val
    scale = jnp.where(hi - lo != 0.0, hi - lo, 1.0)
    return jnp.clip((data - lo) / scale, 0.0, 1.0)


def normalize_linear_scale(data, min_val=None, max_val=None):
    return normalize(data, min_val, max_val)


def normalize_log_scale(data, min_val: Optional[float] = None, max_val: Optional[float] = None):
    """Log-scale normalization for channels with large dynamic range (e.g. error maps)."""
    logged = jnp.log(1.0 + jnp.abs(data))
    return normalize(logged, None if min_val is None else jnp.log(1.0 + abs(min_val)),
                     None if max_val is None else jnp.log(1.0 + abs(max_val)))


def normalize_vector(data, min_val=None, max_val=None):
    """Map unit vectors (e.g. normals in [-1,1]) to color space [0,1]."""
    norm = jnp.linalg.norm(data, axis=-1, keepdims=True)
    safe = jnp.where(norm > 0, norm, 1.0)
    return (data / safe) * 0.5 + 0.5


def identity(data, min_val=None, max_val=None):
    return data


# ---------------------------------------------------------------------------------------------
# Blend functions (reference channel_fn.py:145-330)
# Signature: blend(c1, c2, alpha1, alpha2) -> blended channel, where object 1 is in front.
# ---------------------------------------------------------------------------------------------

def blend_linear(c1, c2, alpha1, alpha2):
    return (c1 + c2) / 2.0


def blend_alpha_composite_over(c1, c2, alpha1, alpha2):
    """Porter-Duff "over": c1 over c2 using premultiplied-style compositing."""
    alpha_out = alpha1 + alpha2 * (1.0 - alpha1)
    safe = jnp.where(alpha_out > 0, alpha_out, 1.0)
    return (c1 * alpha1 + c2 * alpha2 * (1.0 - alpha1)) / safe


def blend_alpha_slerp(c1, c2, alpha1, alpha2):
    """Spherical lerp of vector channels (e.g. normals) weighted by alpha."""
    t = alpha2 / jnp.where(alpha1 + alpha2 > 0, alpha1 + alpha2, 1.0)
    n1 = c1 / jnp.where(jnp.linalg.norm(c1, axis=-1, keepdims=True) > 0,
                        jnp.linalg.norm(c1, axis=-1, keepdims=True), 1.0)
    n2 = c2 / jnp.where(jnp.linalg.norm(c2, axis=-1, keepdims=True) > 0,
                        jnp.linalg.norm(c2, axis=-1, keepdims=True), 1.0)
    dot = jnp.clip(jnp.sum(n1 * n2, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    use_lerp = jnp.abs(so) < 1e-6
    w1 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * omega) / jnp.where(use_lerp, 1.0, so))
    w2 = jnp.where(use_lerp, t, jnp.sin(t * omega) / jnp.where(use_lerp, 1.0, so))
    return w1 * n1 + w2 * n2


def blend_lerp(c1, c2, alpha1, alpha2):
    t = alpha2 / jnp.where(alpha1 + alpha2 > 0, alpha1 + alpha2, 1.0)
    return (1.0 - t) * c1 + t * c2


def blend_normal(c1, c2, alpha1, alpha2):
    """Front object wins where it has alpha coverage."""
    return jnp.where(alpha1 > 0, c1, c2)


def blend_multiply(c1, c2, alpha1, alpha2):
    return c1 * c2


def blend_screen(c1, c2, alpha1, alpha2):
    return 1.0 - (1.0 - c1) * (1.0 - c2)


def blend_add(c1, c2, alpha1, alpha2):
    return c1 + c2


def blend_sub(c1, c2, alpha1, alpha2):
    return c1 - c2


def blend_logical_and(c1, c2, alpha1, alpha2):
    return jnp.logical_and(c1.astype(bool), c2.astype(bool))


def blend_logical_or(c1, c2, alpha1, alpha2):
    return jnp.logical_or(c1.astype(bool), c2.astype(bool))
