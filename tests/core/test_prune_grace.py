"""Grace-period pruning (round-5 erosion fix, VERDICT r4 #4).

The round-4 postmortem: the stochastic single-corner backward's 8x gradient variance
makes MARGINAL cells' densities dip below the prune keep-threshold; an immediate cull is
irreversible in practice (culled cells get no samples, the dip freezes) and erosion
compounds per prune (29.12 dB @25 -> 19.91 @75 on the real chip). With
``prune_grace=G`` a cell is culled only after G CONSECUTIVE below-threshold prunes —
while in grace it keeps training, so an unbiased noise dip recovers; only genuinely dead
cells accumulate a full streak. G=1 is the reference behavior
(/root/reference/wisp/models/nefs/nerf.py:175-212 culls on the first below-threshold
score)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField

pytestmark = pytest.mark.smoke


def _nef(prune_grace, key=7):
    blas = OctreeAS.make_dense(3)
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=2,
                                   codebook_bitwidth=8, min_grid_res=4, max_grid_res=8,
                                   multiscale_type="cat", feature_std=1e-9,
                                   key=jax.random.PRNGKey(key))
    # density head bias starts at 1.0 and features ~0 -> density ~1.0 everywhere,
    # below a 2.0 keep threshold: every cell is 'marginal-below' from the start
    return NeuralRadianceField(grid=grid, hidden_dim=8, bias=True,
                               prune_density_decay=0.95, prune_min_density=2.0,
                               prune_grace=prune_grace, key=jax.random.PRNGKey(key + 1))


def _occ_count(nef):
    return int(np.asarray(nef.grid.blas.occ_grid, bool).sum())


def _boost_density(nef, value=10.0):
    """Push density above any threshold by raising the density-head channel-0 bias."""
    dec = nef.decoder_density
    lout = dec.lout
    return nef.replace(decoder_density=dec.replace(
        lout=lout.replace(bias=lout.bias.at[0].set(value))))


def test_grace_one_is_reference_behavior():
    nef = _nef(prune_grace=1)
    assert nef.prune_streak is None  # no counter allocated; treedef unchanged vs round 4
    total = _occ_count(nef)
    nef = jax.jit(lambda n, k: n.prune(key=k))(nef, jax.random.PRNGKey(0))
    assert _occ_count(nef) == 0, "below-threshold cells must be culled on the FIRST prune"
    assert total > 0


def test_grace_defers_cull_until_streak_full():
    G = 3
    nef = _nef(prune_grace=G)
    total = _occ_count(nef)
    prune = jax.jit(lambda n, k: n.prune(key=k))
    for i in range(G - 1):
        nef = prune(nef, jax.random.PRNGKey(i))
        assert _occ_count(nef) == total, \
            f"prune {i + 1}/{G}: cells in grace must stay occupied (still sampled)"
        assert int(np.asarray(nef.prune_streak).max()) == i + 1
    nef = prune(nef, jax.random.PRNGKey(99))
    assert _occ_count(nef) == 0, "streak reached G consecutive dips -> culled"


def test_grace_recovery_resets_streak():
    G = 3
    nef = _nef(prune_grace=G)
    total = _occ_count(nef)
    prune = jax.jit(lambda n, k: n.prune(key=k))
    for i in range(G - 1):
        nef = prune(nef, jax.random.PRNGKey(i))
    # the dip 'recovers' (training pulled the density back up) one prune before culling
    nef = _boost_density(nef)
    nef = prune(nef, jax.random.PRNGKey(50))
    assert _occ_count(nef) == total
    assert int(np.asarray(nef.prune_streak).max()) == 0, "recovery must reset the streak"
    # and the cell survives G more below-threshold prunes again from scratch
    nef = _boost_density(nef, value=0.0)
    for i in range(G - 1):
        nef = prune(nef, jax.random.PRNGKey(60 + i))
        assert _occ_count(nef) == total


def test_grace_revives_culled_cell_on_density_recovery():
    nef = _nef(prune_grace=2)
    prune = jax.jit(lambda n, k: n.prune(key=k))
    nef = prune(nef, jax.random.PRNGKey(0))
    nef = prune(nef, jax.random.PRNGKey(1))
    assert _occ_count(nef) == 0
    # the density re-query covers ALL tracked cells, so a genuinely recovered field
    # revives culled cells (hash features are shared; other cells' training moves them)
    nef = _boost_density(nef)
    nef = prune(nef, jax.random.PRNGKey(2))
    assert _occ_count(nef) > 0
