"""Unit tests for core datastructs: Module pytree semantics, Rays, RenderBuffer, channels.

Mirrors the reference's core test intent (tests/core/) but for jax pytree behavior under
jit/grad instead of torch tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wisp_tpu.core import Module, Rays, RenderBuffer, channels_starter_kit


class _ToyModule(Module):
    def __init__(self, dim: int):
        self.dim = dim
        self.w = jnp.ones((dim, dim))
        self.b = jnp.zeros((dim,))

    def __call__(self, x):
        return x @ self.w + self.b


class TestModule:
    def test_flatten_roundtrip(self):
        m = _ToyModule(4)
        leaves, treedef = jax.tree_util.tree_flatten(m)
        assert len(leaves) == 2
        m2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert m2.dim == 4
        np.testing.assert_array_equal(m2.w, m.w)

    def test_jit_and_grad(self):
        m = _ToyModule(4)
        x = jnp.ones((2, 4))

        @jax.jit
        def loss_fn(mod, x):
            return jnp.sum(mod(x) ** 2)

        g = jax.grad(loss_fn)(m, x)
        assert isinstance(g, _ToyModule)
        assert g.w.shape == (4, 4)
        assert float(loss_fn(m, x)) > 0

    def test_replace(self):
        m = _ToyModule(4)
        m2 = m.replace(b=jnp.ones((4,)))
        assert float(m.b[0]) == 0.0 and float(m2.b[0]) == 1.0

    def test_static_fields_in_cache_key(self):
        calls = []

        @jax.jit
        def f(mod):
            calls.append(1)
            return mod.w * mod.dim

        f(_ToyModule(4))
        f(_ToyModule(4))
        assert len(calls) == 1  # same static config → cache hit


class TestRays:
    def test_shapes_and_ops(self):
        o = jnp.zeros((10, 3))
        d = jnp.ones((10, 3))
        r = Rays(o, d, 0.0, 5.0)
        assert r.shape == (10,)
        assert len(r) == 10
        r2 = Rays.cat([r, r])
        assert len(r2) == 20
        parts = r2.split(8)
        assert [len(p) for p in parts] == [8, 8, 4]
        rr = r.reshape(2, 5, 3)
        assert rr.shape == (2, 5)
        assert r[2:5].shape == (3,)

    def test_pytree(self):
        r = Rays(jnp.zeros((4, 3)), jnp.ones((4, 3)))

        @jax.jit
        def f(rays):
            return rays.origins + rays.dirs

        np.testing.assert_array_equal(f(r), np.ones((4, 3)))

    def test_normalized(self):
        r = Rays(jnp.zeros((4, 3)), jnp.full((4, 3), 2.0)).normalized()
        np.testing.assert_allclose(np.linalg.norm(r.dirs, axis=-1), 1.0, atol=1e-6)


class TestRenderBuffer:
    def test_channels(self):
        rb = RenderBuffer(rgb=jnp.zeros((4, 4, 3)), alpha=jnp.ones((4, 4, 1)),
                          custom=jnp.zeros((4, 4, 2)))
        assert rb.rgb.shape == (4, 4, 3)
        assert rb.custom.shape == (4, 4, 2)
        assert rb.depth is None
        with pytest.raises(AttributeError):
            _ = rb.nonexistent

    def test_cat_and_pytree(self):
        rb = RenderBuffer(rgb=jnp.zeros((4, 3)), alpha=jnp.ones((4, 1)))
        rb2 = RenderBuffer.cat([rb, rb])
        assert rb2.rgb.shape == (8, 3)

        @jax.jit
        def f(b):
            return b.rgb + b.alpha

        assert f(rb).shape == (4, 3)

    def test_blend_depth_ordering(self):
        kit = channels_starter_kit()
        near = RenderBuffer(rgb=jnp.ones((2, 2, 3)), alpha=jnp.ones((2, 2, 1)),
                            depth=jnp.full((2, 2, 1), 1.0))
        far = RenderBuffer(rgb=jnp.zeros((2, 2, 3)), alpha=jnp.ones((2, 2, 1)),
                           depth=jnp.full((2, 2, 1), 5.0))
        out = far.blend(near, kit)  # near object should win regardless of call order
        np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-6)

    def test_image_export(self):
        rb = RenderBuffer(rgb=jnp.full((2, 2, 3), 0.5))
        img = rb.image()
        assert img.rgb.dtype == jnp.uint8
        assert int(img.rgb[0, 0, 0]) == 127

    def test_scale(self):
        rb = RenderBuffer(rgb=jnp.ones((4, 4, 3)))
        assert rb.scale((8, 8)).rgb.shape == (8, 8, 3)
