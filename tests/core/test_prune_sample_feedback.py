"""Sample-fed prune keep-score (round-5 erosion root-cause fix).

Round-5 postmortem: the round-4 "stochastic backward erosion" reproduced with the EXACT
backward (flagship r5 run: 29.13 dB @25 -> 26.29 @50, loss bottoming at epoch 15 right
after pruning starts). Checkpoint forensics against the analytic GT showed 40.9% of GT
SURFACE cells culled by epoch 66, with culled surface cells DENSER than kept ones —
the single-uniform-point prune query (reference nerf.py:186-196) systematically misses
the sub-voxel density shell that in-training early termination produces, and the
0.95/prune decay then kills the most opaque visible cells.

Fix (instant-ngp's density-grid scheme): the tracer scatter-maxes the densities it
computes at TRAINING samples into a per-cell grid (PackedRFTracer density_feedback);
the trainer carries the running max between prunes and `prune(sample_max=...)` maxes it
into the keep-score — the prune sees exactly what the renderer sees.
"""

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

pytestmark = pytest.mark.smoke

LEVEL = 3
RES = 2 ** LEVEL


def _nef(key=7, min_density=2.0):
    blas = OctreeAS.make_dense(LEVEL)
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=2,
                                   codebook_bitwidth=8, min_grid_res=4, max_grid_res=8,
                                   multiscale_type="cat", feature_std=1e-9,
                                   key=jax.random.PRNGKey(key))
    # density head bias ~1.0 + features ~0 -> queried density ~1.0 < threshold
    # everywhere: without sample feedback every cell dies on the first prune
    return NeuralRadianceField(grid=grid, hidden_dim=8, bias=True,
                               prune_density_decay=0.95, prune_min_density=min_density,
                               key=jax.random.PRNGKey(key + 1))


def _occ_count(nef):
    return int(np.asarray(nef.grid.blas.occ_grid, bool).sum())


def test_sample_max_keeps_cells_the_query_misses():
    """Cells whose sampled density exceeded the threshold survive a prune whose point
    query reads below-threshold (the sub-voxel-shell case)."""
    nef = _nef()
    total = _occ_count(nef)
    smax = jnp.zeros((RES ** 3,), jnp.float32)
    keep_ids = jnp.asarray([0, 5, RES ** 3 - 1])
    smax = smax.at[keep_ids].set(10.0)  # renderer saw high density in these cells
    prune = jax.jit(lambda n, k, s: n.prune(key=k, sample_max=s))
    nef = prune(nef, jax.random.PRNGKey(0), smax)
    occ = np.asarray(nef.grid.blas.occ_grid, bool)
    assert total > 3
    assert occ.sum() == 3, "only the sample-fed cells survive"
    assert occ[np.asarray(keep_ids)].all()


def test_sample_max_feeds_the_persistent_keep_score():
    """The sampled max enters the decayed running keep-score, so a single high sample
    protects the cell for ~log(d/thr)/log(1/decay) later prunes even with zero samples
    and below-threshold queries afterwards (temporal protection, not a one-shot veto)."""
    nef = _nef()
    smax = jnp.zeros((RES ** 3,), jnp.float32).at[3].set(4.0)
    prune = jax.jit(lambda n, k, s: n.prune(key=k, sample_max=s))
    zeros = jnp.zeros_like(smax)
    nef = prune(nef, jax.random.PRNGKey(0), smax)
    assert np.asarray(nef.grid.blas.occ_grid, bool)[3]
    # 4.0 * 0.95^k stays above 2.0 for k <= 13
    for i in range(13):
        nef = prune(nef, jax.random.PRNGKey(1 + i), zeros)
        assert np.asarray(nef.grid.blas.occ_grid, bool)[3], f"died at decay step {i + 1}"
    nef = prune(nef, jax.random.PRNGKey(99), zeros)
    assert not np.asarray(nef.grid.blas.occ_grid, bool)[3], \
        "with no fresh evidence the decayed score must eventually cull"


def test_tracer_density_feedback_emits_sampled_cells():
    """trace(density_feedback=True) returns a [res^3] grid whose support is exactly the
    cells containing valid (occupied, non-early-stopped) samples."""
    nef = _nef()
    tracer = PackedRFTracer(raymarch_type="ray", num_steps=32, bg_color=(0, 0, 0),
                            compaction=0.5)
    pipeline = Pipeline(nef=nef, tracer=tracer)
    n = 16
    origins = np.tile(np.asarray([[0.0, 0.0, -2.0]], np.float32), (n, 1))
    dirs = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    dirs += 0.05 * np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 4.0)

    rb = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha"],
                                density_feedback=True))(pipeline, rays)
    grid = np.asarray(rb.density_max_grid)
    assert grid.shape == (RES ** 3,)
    assert (grid > 0).sum() > 0, "rays through a dense blas must feed some cells"
    # the untrained field's density is ~1.0 everywhere -> fed cells read ~1.0
    assert np.allclose(grid[grid > 0], 1.0, atol=0.3)
    # without the flag the channel is absent
    rb2 = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha"]))(pipeline, rays)
    assert "density_max_grid" not in rb2.channels


def test_tracer_feedback_matches_between_compaction_modes():
    """The fed grid must not depend on whether compaction is enabled (same samples)."""
    nef = _nef()
    n = 8
    origins = np.tile(np.asarray([[0.0, 0.0, -2.0]], np.float32), (n, 1))
    dirs = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 4.0)
    grids = []
    for comp in (0.0, 1.0):
        tracer = PackedRFTracer(raymarch_type="ray", num_steps=32, bg_color=(0, 0, 0),
                                compaction=comp)
        pipeline = Pipeline(nef=nef, tracer=tracer)
        rb = jax.jit(lambda p, r: p(rays=r, channels=["rgb", "alpha"],
                                    density_feedback=True))(pipeline, rays)
        grids.append(np.asarray(rb.density_max_grid))
    np.testing.assert_allclose(grids[0], grids[1], rtol=1e-5, atol=1e-6)
