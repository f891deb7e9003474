"""Differential operators over scalar fields (reference wisp/ops/differential/gradients.py:14-48).

On TPU, autodiff gradients come from jax.grad/vjp instead of torch.autograd.grad; finite
difference and the 4-tap tetrahedron stencil are provided for parity (the reference sphere
tracer uses finitediff for normals, packed_sdf_tracer.py:167-170).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def autodiff_gradient(x, f):
    """Exact gradient of scalar field ``f`` at points ``x`` [N,3] via reverse-mode autodiff
    (reference gradients.py:14-23)."""
    def scalar_f(pt):
        return jnp.sum(f(pt[None])[0])
    return jax.vmap(jax.grad(scalar_f))(x)


def finitediff_gradient(x, f, eps: float = 0.005):
    """Central finite differences, 6 taps (reference gradients.py:26-37)."""
    e = jnp.asarray([[eps, 0.0, 0.0], [0.0, eps, 0.0], [0.0, 0.0, eps]], dtype=x.dtype)
    grads = []
    for i in range(3):
        hi = f(x + e[i]).reshape(x.shape[0], -1)[:, :1]
        lo = f(x - e[i]).reshape(x.shape[0], -1)[:, :1]
        grads.append((hi - lo) / (2 * eps))
    return jnp.concatenate(grads, axis=-1)


def tetrahedron_gradient(x, f, eps: float = 0.005):
    """4-tap tetrahedron stencil (reference gradients.py:40-48) — cheaper than central
    differences, used by SDF shading."""
    h = eps
    k0 = jnp.asarray([1.0, -1.0, -1.0], dtype=x.dtype)
    k1 = jnp.asarray([-1.0, -1.0, 1.0], dtype=x.dtype)
    k2 = jnp.asarray([-1.0, 1.0, -1.0], dtype=x.dtype)
    k3 = jnp.asarray([1.0, 1.0, 1.0], dtype=x.dtype)

    def s(k):
        return f(x + h * k).reshape(x.shape[0], -1)[:, :1]

    g = (k0[None] * s(k0) + k1[None] * s(k1) + k2[None] * s(k2) + k3[None] * s(k3))
    return g / (4.0 * h)
