"""Trainable/buffer split (utils/filter.py buffer_paths).

Structural float state — accel-struct arrays (``__trainable__ = False`` subtrees) and
grid pruning EMAs (``BLASGrid.__buffers__``) — must stay out of the trainable partition.
Regression for the bench cold-phase crash: blas.cell_density was classified trainable,
DONATED by the jitted step, and deleted out from under a second pipeline sharing the
same blas object. Reference contrast: torch marks parameters explicitly
(wisp/models/grids/hash_grid.py registers only feature tensors as nn.Parameter).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers import PackedRFTracer
from wisp_tpu.utils.filter import TreeSpec, buffer_paths

pytestmark = pytest.mark.smoke


def _pipeline(blas, seed=1):
    grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=3,
                                   multiscale_type="cat", feature_std=1e-9,
                                   codebook_bitwidth=12, min_grid_res=8,
                                   max_grid_res=64, key=jax.random.PRNGKey(seed))
    nef = NeuralRadianceField(grid=grid, view_embedder="positional", view_multires=2,
                              hidden_dim=8, num_layers=1, bias=True,
                              key=jax.random.PRNGKey(seed + 1))
    tracer = PackedRFTracer(raymarch_type="ray", num_steps=16, compaction=0.5,
                            bg_color=(0.0, 0.0, 0.0))
    return Pipeline(nef=nef, tracer=tracer)


def test_blas_and_occupancy_are_buffers():
    pipe = _pipeline(OctreeAS.make_dense(4))
    spec = TreeSpec(pipe)
    assert ".nef.grid.blas.cell_density" in spec.nondiff
    assert ".nef.grid.occupancy" in spec.nondiff
    bufs = buffer_paths(pipe)
    assert ".nef.grid.blas.cell_density" in bufs
    assert ".nef.grid.occupancy" in bufs
    # real params stay trainable
    assert ".nef.grid.codebook.feats" in spec.diff
    assert any(".decoder_color" in p for p in spec.diff)
    # nothing float under the blas subtree leaks into diff
    assert not any(".blas." in p for p in spec.diff)


def test_trainer_step_does_not_delete_shared_blas_arrays():
    """Two trainers on the SAME blas object (the bench's warm/cold phases) must not
    alias-delete each other's arrays through jit donation."""
    from wisp_tpu.config.presets import ConfigAdamW
    from wisp_tpu.core import Rays
    from wisp_tpu.trainers.multiview_trainer import (ConfigMultiviewTrainer,
                                                     MultiviewTrainer)
    from wisp_tpu.trainers.tracker import ConfigTracker, Tracker

    blas = OctreeAS.make_dense(4)

    def build():
        cfg = ConfigMultiviewTrainer(optimizer=ConfigAdamW(lr=1e-3),
                                     rgb_loss_type="huber", max_epochs=1,
                                     prune_every=-1, render_every=-1, valid_every=-1,
                                     save_every=-1, exp_name="buf-split")

        class _DS:
            cameras = {}
            transform = None

            def __len__(self):
                return 2

        tracker = Tracker(ConfigTracker(tensorboard=False,
                                        log_dir="/tmp/wisp_buf_split"), "buf-split")
        return MultiviewTrainer(cfg=cfg, pipeline=_pipeline(blas),
                                train_dataset=_DS(), tracker=tracker)

    rng = np.random.default_rng(0)
    n = 64
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 2.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(np.asarray([0.0, 0.0, -3.0], np.float32), (n, 3)).copy()
    batch = (Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 6.0),
             jnp.asarray(rng.random((n, 3)).astype(np.float32)),
             jnp.asarray(0, jnp.int32))

    t1 = build()
    for _ in range(2):
        loss1, _ = t1.run_step(batch)
    blas.cell_density._check_if_deleted()  # donated before the fix -> RuntimeError
    t2 = build()
    loss2, _ = t2.run_step(batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


@pytest.mark.kernel
def test_restore_old_split_checkpoint_drops_buffer_moments(tmp_path):
    """Checkpoints written when buffers were classified trainable must restore into the
    new split: params land in diff, buffers in nondiff, surviving optimizer moments kept."""
    from wisp_tpu.trainers.checkpoint import restore_checkpoint, save_checkpoint
    from tests.core.test_checkpoint import _make_trainer

    t1 = _make_trainer(tmp_path)
    t1.pre_training()
    data = t1.train_dataset[0]
    for _ in range(3):
        t1.step(data)

    # forge an OLD-split checkpoint: move one nondiff float leaf into diff and give it
    # optimizer moments, exactly what a pre-reclassification checkpoint contains
    import pickle
    import jax.tree_util as jtu
    from wisp_tpu.trainers.checkpoint import _gather_state
    state = jax.device_get(_gather_state(t1))
    moved = next((k for k, v in state["nondiff"].items()
                  if isinstance(v, np.ndarray) and v.dtype == np.float32), None)
    if moved is None:  # ensure the scenario exists even if nondiff has no floats
        state["nondiff"]["._fake_buffer"] = np.zeros((7,), np.float32)
        moved = "._fake_buffer"
    state["diff"][moved] = state["nondiff"][moved]
    old_keys = set(state["diff"])

    def widen(n):
        if isinstance(n, dict) and set(n) == old_keys - {moved}:
            return {**n, moved: np.zeros_like(state["diff"][moved])}
        return n

    state["opt_state"] = jtu.tree_map(
        widen, state["opt_state"],
        is_leaf=lambda n: isinstance(n, dict) and set(n) == old_keys - {moved})
    path = str(tmp_path / "old_split.pkl")
    with open(path, "wb") as fh:
        pickle.dump(state, fh)

    t2 = _make_trainer(tmp_path, seed=5)
    t2.pre_training()
    restore_checkpoint(t2, path)
    assert set(t2._diff) == set(t2._spec.diff)
    assert moved not in t2._diff or moved in t2._spec.diff
    # the restored trainer still steps
    t2._step_fn = None
    t2.step(data)
    # moments for surviving params came from the checkpoint, not a re-init
    flat = [x for x in jtu.tree_leaves(t2.opt_state) if isinstance(x, jax.Array)]
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
