"""Segmented TRUE-transmittance training cull (packed_rf_tracer._trace_segmented).

The unbiased training-admissible early termination designed in perf_playbook.md after
the round-4/5 erosion root cause: the cull criterion is the ray's own decoded optical
depth (the compositor's rule, reference wisp/tracers/packed_rf_tracer.py:137-165), so a
truly-visible sample can never be dropped — unlike the cell-peak tau_hat estimate
(`early_stop`). These tests pin: numerical equivalence to the unsegmented path when the
cull threshold is negligible (forward AND gradients), bounded divergence at a real
threshold, cull savings on an opaque field, overflow counting, and the seg_frac_max
signal the trainer's adaptive-compaction retuner keys off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers import PackedRFTracer


def _setup(compaction=1.0, seg_early_stop=0.0, seg_count=4, feature_std=0.05,
            feature_bias=0.0):
    blas = OctreeAS.make_dense(3)
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=4,
                                   codebook_bitwidth=10, min_grid_res=4, max_grid_res=32,
                                   multiscale_type="cat", feature_std=feature_std,
                                   feature_bias=feature_bias,
                                   key=jax.random.PRNGKey(3))
    nef = NeuralRadianceField(grid=grid, view_embedder="positional", hidden_dim=32,
                              bias=True, key=jax.random.PRNGKey(4))
    tracer = PackedRFTracer(raymarch_type="ray", num_steps=32, bg_color=(1.0, 1.0, 1.0),
                            compaction=compaction, seg_early_stop=seg_early_stop,
                            seg_count=seg_count)
    return Pipeline(nef=nef, tracer=tracer)


def _rays(n=64):
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(np.asarray([0, 0, -3.0], np.float32), (n, 3))
    return Rays(jnp.asarray(origins.copy()), jnp.asarray(dirs), 0.0, 8.0)


def _trace(pipe, rays):
    return jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha", "depth"]))(
        pipe, rays)


@pytest.mark.kernel
class TestSegmentedCull:
    def test_negligible_eps_matches_unsegmented(self):
        """seg path with an eps far below any reachable optical depth decodes every
        sample the unsegmented path decodes -> outputs identical to fp tolerance."""
        rays = _rays(48)
        rb_ref = _trace(_setup(compaction=1.0), rays)
        rb_seg = _trace(_setup(compaction=1.0, seg_early_stop=1e-20, seg_count=4), rays)
        np.testing.assert_allclose(np.asarray(rb_seg.rgb), np.asarray(rb_ref.rgb),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(rb_seg.alpha), np.asarray(rb_ref.alpha),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(rb_seg.depth), np.asarray(rb_ref.depth),
                                   atol=2e-4)
        assert float(rb_seg.num_valid_samples) == pytest.approx(
            float(rb_ref.num_valid_samples))
        # uneven segment split (num_steps 32, G=5 -> padded tail segment) still matches
        rb_odd = _trace(_setup(compaction=1.0, seg_early_stop=1e-20, seg_count=5), rays)
        np.testing.assert_allclose(np.asarray(rb_odd.rgb), np.asarray(rb_ref.rgb),
                                   atol=2e-5)

    @pytest.mark.full  # compile-heavy (keeps the smoke gate fast)
    def test_negligible_eps_matches_gradients(self):
        """Gradients through the scan (incl. the cross-segment acc_tau chain) must equal
        the unsegmented backward when nothing is culled — the backward is exact."""
        rays = _rays(16)

        from wisp_tpu.utils.filter import filter_value_and_grad

        def loss_fn(pipe):
            rb = pipe(rays=rays, channels=["rgb"])
            return jnp.sum(rb.rgb ** 2)

        _, g_ref = filter_value_and_grad(loss_fn)(_setup(compaction=1.0))
        _, g_seg = filter_value_and_grad(loss_fn)(
            _setup(compaction=1.0, seg_early_stop=1e-20, seg_count=4))
        ref_leaves = dict(jax.tree_util.tree_leaves_with_path(g_ref))
        nonzero = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_seg):
            np.testing.assert_allclose(np.asarray(leaf),
                                       np.asarray(ref_leaves[path]),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=str(path))
            nonzero += float(jnp.abs(leaf).sum()) > 0
        assert nonzero > 0

    def test_real_eps_culls_and_bounds_divergence(self):
        """On an opaque field, a real threshold culls the saturated tail while the
        composited image moves by O(eps), not O(1)."""

        class OpaqueNef(NeuralRadianceField):
            """Density pinned high: every ray saturates within its first samples."""
            def __call__(self, channels, coords, ray_d=None, lod_idx=None,
                         max_compute_lod=None, **kw):
                out = super().__call__(channels=channels, coords=coords, ray_d=ray_d,
                                       lod_idx=lod_idx,
                                       max_compute_lod=max_compute_lod, **kw)
                out = dict(out)
                out["density"] = jnp.full_like(out["density"], 50.0)
                return out

        def mk(**kw):
            pipe = _setup(**kw)
            nef = OpaqueNef(grid=pipe.nef.grid, view_embedder="positional",
                            hidden_dim=32, bias=True, key=jax.random.PRNGKey(4))
            return pipe.replace(nef=nef)

        rays = _rays(48)
        rb_ref = _trace(mk(compaction=1.0), rays)
        rb_seg = _trace(mk(compaction=1.0, seg_early_stop=1e-3, seg_count=4), rays)
        assert float(rb_seg.num_valid_samples) < 0.7 * float(rb_ref.num_valid_samples), \
            "opaque field should cull the saturated tail of every hitting ray"
        # weights of culled samples are < eps; image error stays small
        np.testing.assert_allclose(np.asarray(rb_seg.rgb), np.asarray(rb_ref.rgb),
                                   atol=5e-3)

    def test_overflow_counted_not_silent(self):
        """A budget below a segment's valid count truncates step-major AND reports the
        drop in num_overflow (adaptive retuning grows the budget off seg_frac_max)."""
        rays = _rays(48)
        rb = _trace(_setup(compaction=1.0 / 32, seg_early_stop=1e-20, seg_count=4), rays)
        assert float(rb.num_overflow) > 0.0

    def test_seg_frac_max_covers_peak_segment(self):
        """seg_frac_max >= global valid fraction (peak >= mean) and <= 1; the retuner
        sizes the uniform per-segment budgets off it."""
        rays = _rays(48)
        rb = _trace(_setup(compaction=1.0, seg_early_stop=1e-20, seg_count=4), rays)
        n, s = 48, 32
        global_frac = float(rb.num_valid_samples) / (n * s)
        peak = float(rb.seg_frac_max)
        assert global_frac - 1e-6 <= peak <= 1.0

    def test_mutually_exclusive_with_tau_hat(self):
        """seg_early_stop + early_stop (the erosion-prone cell-peak estimate) is a
        config error, not a silent combination."""
        pipe = _setup(compaction=1.0, seg_early_stop=1e-3, seg_count=4)
        pipe = pipe.replace(tracer=pipe.tracer.replace(early_stop=0.01))
        with pytest.raises(ValueError, match="mutually exclusive"):
            pipe(rays=_rays(8), channels=["rgb"])

    def test_requires_compaction(self):
        pipe = _setup(compaction=0.0, seg_early_stop=1e-3, seg_count=4)
        with pytest.raises(ValueError, match="compaction"):
            pipe(rays=_rays(8), channels=["rgb"])
