"""Tracer unit tests: masked volumetric integration vs analytic reference + compaction
equivalence (the reference smoke-tests extra-channel plumbing, test_packed_rf_tracer.py)."""

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


def _setup(compaction=0.0):
    blas = OctreeAS.make_dense(3)
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=4,
                                   codebook_bitwidth=10, min_grid_res=4, max_grid_res=32,
                                   multiscale_type="cat", feature_std=0.05,
                                   key=jax.random.PRNGKey(3))
    nef = NeuralRadianceField(grid=grid, view_embedder="positional", hidden_dim=32,
                              bias=True, key=jax.random.PRNGKey(4))
    tracer = PackedRFTracer(raymarch_type="ray", num_steps=32, bg_color=(1.0, 1.0, 1.0),
                            compaction=compaction)
    return Pipeline(nef=nef, tracer=tracer)


def _rays(n=64):
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.5
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(np.asarray([0, 0, -3.0], np.float32), (n, 3))
    return Rays(jnp.asarray(origins.copy()), jnp.asarray(dirs), 0.0, 8.0)


@pytest.mark.kernel
class TestPackedRFTracer:
    @pytest.mark.full  # compile-heavy: keeps the smoke gate under its <3 min promise
    def test_output_channels(self):
        pipe = _setup()
        rb = pipe(rays=_rays(), channels=["rgb", "alpha", "depth", "hit"])
        assert rb.rgb.shape == (64, 3)
        assert rb.alpha.shape == (64, 1)
        assert rb.depth.shape == (64, 1)
        assert float(rb.alpha.min()) >= 0.0 and float(rb.alpha.max()) <= 1.0 + 1e-5

    def test_miss_rays_get_bg(self):
        pipe = _setup()
        # rays that never touch the aabb
        rays = Rays(jnp.asarray([[5.0, 5.0, 5.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
                    0.0, 2.0)
        rb = pipe(rays=rays, channels=["rgb", "alpha"])
        np.testing.assert_allclose(np.asarray(rb.rgb), 1.0, atol=1e-6)  # white bg
        np.testing.assert_allclose(np.asarray(rb.alpha), 0.0, atol=1e-6)

    def test_compaction_equivalence(self):
        """With a sufficient budget, compaction must be numerically identical to the dense
        path (same samples, same integration)."""
        pipe_dense = _setup(compaction=0.0)
        pipe_comp = pipe_dense.replace(
            tracer=pipe_dense.tracer.replace(compaction=1.0))
        rays = _rays(32)
        rb_a = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha", "depth"]))(
            pipe_dense, rays)
        rb_b = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha", "depth"]))(
            pipe_comp, rays)
        np.testing.assert_allclose(np.asarray(rb_a.rgb), np.asarray(rb_b.rgb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rb_a.alpha), np.asarray(rb_b.alpha),
                                   atol=1e-5)

    @pytest.mark.full
    def test_compaction_gradients(self):
        pipe = _setup(compaction=1.0)
        rays = _rays(16)

        def loss(p):
            rb = p(rays=rays, channels=["rgb"])
            return jnp.mean(rb.rgb ** 2)

        from wisp_tpu.utils.filter import filter_value_and_grad
        val, grads = filter_value_and_grad(loss)(pipe)
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    @pytest.mark.full  # compile-heavy: keeps the smoke gate under its <3 min promise
    def test_extra_channel_integration(self):
        """Extra channels volumetrically integrate (reference packed_rf_tracer.py:167-179);
        uses the latent-nerf example field."""
        import sys, os
        sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                        "..", "..")))
        from examples.latent_nerf.funny_neural_field import FunnyNeuralField
        blas = OctreeAS.make_dense(3)
        grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=4,
                                       codebook_bitwidth=10, min_grid_res=4,
                                       max_grid_res=32, multiscale_type="cat",
                                       feature_std=0.05, key=jax.random.PRNGKey(5))
        nef = FunnyNeuralField(grid=grid, key=jax.random.PRNGKey(6))
        pipe = Pipeline(nef=nef, tracer=PackedRFTracer(raymarch_type="ray", num_steps=16))
        rb = pipe(rays=_rays(8), channels=["rgb", "color_feature"])
        assert rb.color_feature.shape == (8, 3)

    def test_early_stop_identity_before_prune(self):
        """Until pruning refreshes the density EMA, estimates are exactly 0 → transmittance
        1 → early_stop must be a no-op (bit-identical output)."""
        pipe = _setup()
        pipe_es = pipe.replace(tracer=pipe.tracer.replace(early_stop=1e-2))
        rays = _rays(32)
        rb_a = pipe(rays=rays, channels=["rgb", "alpha"])
        rb_b = pipe_es(rays=rays, channels=["rgb", "alpha"])
        np.testing.assert_array_equal(np.asarray(rb_a.rgb), np.asarray(rb_b.rgb))

    def test_early_stop_culls_occluded_samples(self):
        """Steady state: the density EMA matches the field's true (opaque) density, so
        samples behind the surface must be culled (num_valid_samples drops) with a
        negligible change to the integrated image (instant-ngp early termination)."""
        pipe = _setup()
        # make the field genuinely opaque: density head bias -> ~60 everywhere
        dd = pipe.nef.decoder_density
        dd = dd.replace(lout=dd.lout.replace(bias=dd.lout.bias.at[0].set(60.0)))
        pipe = pipe.replace(nef=pipe.nef.replace(decoder_density=dd))
        blas = pipe.nef.grid.blas
        dens = jnp.where(blas.occ_grid, 60.0, -1.0)  # EMA = true density
        blas2 = blas.update_occupancy(blas.occ_grid, cell_density=dens)
        pipe2 = pipe.replace(nef=pipe.nef.replace(grid=pipe.nef.grid.replace(blas=blas2)))
        pipe_es = pipe2.replace(tracer=pipe2.tracer.replace(early_stop=1e-3))
        rays = _rays(32)
        rb_full = pipe2(rays=rays, channels=["rgb", "alpha"])
        rb_es = pipe_es(rays=rays, channels=["rgb", "alpha"])
        assert float(rb_es.num_valid_samples) < 0.5 * float(rb_full.num_valid_samples)
        np.testing.assert_allclose(np.asarray(rb_es.alpha), np.asarray(rb_full.alpha),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(rb_es.rgb), np.asarray(rb_full.rgb),
                                   atol=2e-3)

    def test_extra_channels_ride_compaction(self, monkeypatch):
        """Extra channels must share the single compacted nef call — no grid interpolation
        may run on the full uncompacted [R*S] sample set (VERDICT r1 #5; contrast reference
        packed_rf_tracer.py:167-179 which re-queries per channel)."""
        import sys, os
        sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                        "..", "..")))
        from examples.latent_nerf.funny_neural_field import FunnyNeuralField

        blas = OctreeAS.make_dense(3)
        grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=4,
                                       codebook_bitwidth=10, min_grid_res=4,
                                       max_grid_res=32, multiscale_type="cat",
                                       feature_std=0.05, key=jax.random.PRNGKey(5))
        nef = FunnyNeuralField(grid=grid, key=jax.random.PRNGKey(6))
        n_rays, n_steps = 64, 16  # full=1024 samples; budget=0.25 -> 256
        tracer = PackedRFTracer(raymarch_type="ray", num_steps=n_steps, compaction=0.25)
        pipe = Pipeline(nef=nef, tracer=tracer)

        calls = []
        orig = HashGrid.interpolate

        def spy(self, coords, lod_idx, *a, **k):
            calls.append(int(coords.shape[0]))
            return orig(self, coords, lod_idx, *a, **k)

        monkeypatch.setattr(HashGrid, "interpolate", spy)
        pipe(rays=_rays(n_rays), channels=["rgb", "color_feature"])
        assert calls, "spy never fired"
        full = n_rays * n_steps
        assert all(c < full for c in calls), \
            f"grid interpolation ran on uncompacted samples: {calls} (full={full})"


@pytest.mark.kernel
class TestCompactionTruncationOrder:
    def test_truncation_drops_late_steps_not_whole_rays(self):
        """When the compaction budget is smaller than the valid-sample count, the kept set
        must be the EARLIEST march steps across all rays (step-major order) — whole-ray
        truncation renders trailing rays as pure background and inverts their gradients
        (observed training collapse). Every ray that hits the scene must keep its early
        samples and produce nonzero alpha even under a starved budget."""
        pipe = _setup(compaction=0.0)
        rays = _rays(64)
        dense = pipe(rays=rays, channels=["rgb", "alpha"])
        hit = np.asarray(dense.alpha[:, 0]) > 0.05

        starved = pipe.replace(tracer=pipe.tracer.replace(compaction=0.25))
        rb = starved(rays=rays, channels=["rgb", "alpha"])
        alpha = np.asarray(rb.alpha[:, 0])
        # all scene-hitting rays keep early samples -> nonzero alpha for every one of them
        assert (alpha[hit] > 0.0).all(), \
            f"{(alpha[hit] <= 0).sum()} of {hit.sum()} hitting rays lost all samples"


class TestPruneDensityField:
    def test_cell_density_carries_fresh_density_not_inflated_occupancy(self):
        """The prune keep-score is max(density, occupancy*2.956) (reference semantics,
        nerf.py:175-212) and inflates ~2.956^k over k prunes. The blas cell-density field
        that powers transmittance early termination must carry the FRESH re-queried
        density instead — feeding it the inflated score culled every sample behind the
        first occupied cell by prune ~10 (measured 50-epoch collapse, 40 dB -> 20 dB)."""
        pipe = _setup()
        nef = pipe.nef
        maxima = []
        for i in range(4):
            nef = nef.prune(key=jax.random.PRNGKey(i))
            cd = np.asarray(nef.grid.blas.cell_density)
            kept = cd[cd >= 0.0]
            assert kept.size > 0, "prune removed every cell"
            maxima.append(float(kept.max()))
        # fresh density of a fixed (untrained) nef is stable across prunes; the inflated
        # occupancy score would grow ~2.956x per prune
        assert maxima[-1] < maxima[0] * 2.0, f"density field inflating: {maxima}"
