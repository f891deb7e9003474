"""Checkpoint / resume.

The reference saves either the whole pickled Pipeline or a bare state_dict, with no optimizer
state and no mid-run resume (reference base_trainer.py:344-359, SURVEY.md §5.4). This module
is the strictly-more-capable TPU story: orbax-backed checkpoints of
(param arrays by path, optimizer state, epoch/iteration counters, RNG key), restorable into a
freshly-constructed trainer. The pipeline *structure* (octree topology, static config) is
reconstructed by the app from its config; only arrays ride in the checkpoint.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def save_checkpoint(trainer, path: str) -> str:
    """Write a full training-state checkpoint (params + opt state + counters + key)."""
    path = os.path.abspath(path)
    state = {
        "diff": dict(trainer._diff),
        "nondiff": dict(trainer._nondiff),
        "opt_state": trainer.opt_state,
        "meta": {
            "epoch": np.asarray(trainer.epoch),
            "iteration": np.asarray(trainer.iteration),
            "key": trainer._key,
        },
    }
    try:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
    except Exception as e:  # noqa: BLE001 — orbax backends vary; fall back to npz+pickle
        log.warning(f"orbax save failed ({e}); using pickle fallback")
        import pickle
        with open(path + ".pkl", "wb") as fh:
            pickle.dump(jax.device_get(state), fh)
        path = path + ".pkl"
    log.info(f"checkpoint saved to {path}")
    return path


def restore_checkpoint(trainer, path: str) -> None:
    """Restore training state into a constructed trainer (same config/topology)."""
    path = os.path.abspath(path)
    if path.endswith(".pkl") or os.path.exists(path + ".pkl"):
        import pickle
        with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as fh:
            state = pickle.load(fh)
    else:
        import orbax.checkpoint as ocp
        template = {
            "diff": dict(trainer._diff),
            "nondiff": dict(trainer._nondiff),
            "opt_state": trainer.opt_state,
            "meta": {"epoch": np.asarray(trainer.epoch),
                     "iteration": np.asarray(trainer.iteration),
                     "key": trainer._key},
        }
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path, jax.device_get(template))

    trainer._diff = {k: jax.numpy.asarray(v) for k, v in state["diff"].items()}
    trainer._nondiff = {k: jax.numpy.asarray(v) for k, v in state["nondiff"].items()}
    trainer.opt_state = jax.tree_util.tree_map(jax.numpy.asarray, state["opt_state"])
    trainer.epoch = int(state["meta"]["epoch"])
    trainer.iteration = int(state["meta"]["iteration"])
    trainer._key = jax.numpy.asarray(state["meta"]["key"])
    trainer.sync_pipeline()
    log.info(f"checkpoint restored from {path} (epoch {trainer.epoch}, "
             f"iteration {trainer.iteration})")
