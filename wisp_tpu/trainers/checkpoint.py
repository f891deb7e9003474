"""Checkpoint / resume.

The reference saves either the whole pickled Pipeline or a bare state_dict, with no optimizer
state and no mid-run resume (reference base_trainer.py:344-359, SURVEY.md §5.4). This module
is the strictly-more-capable TPU story: checkpoints of (param arrays by path, optimizer
state, epoch/iteration counters, RNG key, adaptive-tuner state), restorable into a
freshly-constructed trainer. The pipeline *structure* (octree topology, static config) is
reconstructed by the app from its config; only arrays + small scalars ride in the checkpoint.

Two backends:
* ``pickle`` (default): ONE file written atomically (tmp + rename) — a watchdog kill can
  never leave a torn checkpoint, and the relaunched process resumes from the last complete
  one. This is the backend the wedge-survival path (tools/watchdog.py) relies on.
* ``orbax``: StandardCheckpointer directory checkpoints (kept for parity with orbax
  tooling; its own commit semantics handle atomicity).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)

TRAIN_STATE_BASENAME = "train_state"


def _gather_state(trainer) -> Dict[str, Any]:
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
    extra = trainer.extra_state() if hasattr(trainer, "extra_state") else None
    if extra:
        state["extra"] = extra
    return state


def save_checkpoint(trainer, path: str, backend: str = "auto") -> str:
    """Write a full training-state checkpoint (params + opt state + counters + key +
    adaptive-tuner state). ``backend='pickle'`` writes one file atomically;
    ``'orbax'`` uses StandardCheckpointer; ``'auto'`` tries orbax, falls back to pickle."""
    path = os.path.abspath(path)
    state = _gather_state(trainer)
    if backend == "pickle":
        final = path if path.endswith(".pkl") else path + ".pkl"
        tmp = final + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(jax.device_get(state), fh)
        os.replace(tmp, final)  # atomic: a mid-write kill leaves only the stale .tmp
        log.info(f"checkpoint saved to {final}")
        return final
    try:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
    except Exception as e:  # noqa: BLE001 — orbax backends vary; fall back to pickle
        if backend == "orbax":
            raise
        log.warning(f"orbax save failed ({e}); using pickle fallback")
        return save_checkpoint(trainer, path, backend="pickle")
    log.info(f"checkpoint saved to {path}")
    return path


def restore_checkpoint(trainer, path: str) -> None:
    """Restore training state into a constructed trainer (same config/topology)."""
    path = os.path.abspath(path)
    if path.endswith(".pkl") or os.path.exists(path + ".pkl"):
        with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as fh:
            state = pickle.load(fh)
    else:
        import orbax.checkpoint as ocp
        template = _gather_state(trainer)
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path, jax.device_get(template))

    # Re-split restored leaves by the trainer's CURRENT TreeSpec rather than the
    # checkpoint's: the diff/nondiff boundary is code (buffer markers in
    # utils/filter.py), not state, so a checkpoint written before a leaf was
    # reclassified (e.g. blas.cell_density / grid.occupancy moving to buffers) must
    # restore into the new layout or the step would donate/optimize stale paths.
    merged = {**state["nondiff"], **state["diff"]}
    spec = trainer._spec
    missing = [k for k in spec.paths if k not in merged]
    if missing:
        raise ValueError(f"checkpoint is missing leaves {missing[:5]} — "
                         "was it written for a different pipeline topology?")
    trainer._diff = {k: jax.numpy.asarray(merged[k]) for k in spec.diff}
    trainer._nondiff = {k: jax.numpy.asarray(merged[k]) for k in spec.nondiff}
    opt_state = state["opt_state"]
    ckpt_keys, cur_keys = set(state["diff"]), set(spec.diff)
    if ckpt_keys != cur_keys:
        if cur_keys <= ckpt_keys:
            # leaves left the trainable set: drop their optimizer moments, keep the rest
            def _is_param_dict(n):
                return isinstance(n, dict) and set(n) == ckpt_keys

            opt_state = jax.tree_util.tree_map(
                lambda n: {k: n[k] for k in cur_keys} if _is_param_dict(n) else n,
                opt_state, is_leaf=_is_param_dict)
            log.info("restore: dropped optimizer state for reclassified buffer paths %s",
                     sorted(ckpt_keys - cur_keys))
        else:
            # new trainable leaves have no moments — a fresh init is the only safe option
            log.warning("restore: trainable set gained paths %s — reinitializing "
                        "optimizer state", sorted(cur_keys - ckpt_keys))
            opt_state = trainer.optimizer.init(trainer._diff)
    trainer.opt_state = jax.tree_util.tree_map(jax.numpy.asarray, opt_state)
    trainer.epoch = int(state["meta"]["epoch"])
    trainer.iteration = int(state["meta"]["iteration"])
    trainer._key = jax.numpy.asarray(state["meta"]["key"])
    if state.get("extra") and hasattr(trainer, "load_extra_state"):
        trainer.load_extra_state(state["extra"])
    trainer.sync_pipeline()
    log.info(f"checkpoint restored from {path} (epoch {trainer.epoch}, "
             f"iteration {trainer.iteration})")


def latest_checkpoint(log_dir: str) -> Optional[str]:
    """Newest complete train-state checkpoint under ``log_dir`` (used by ``resume: auto``
    and by watchdog relaunches). Ignores in-flight ``.tmp`` files."""
    if not os.path.isdir(log_dir):
        return None
    cands = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
             if f.startswith(TRAIN_STATE_BASENAME) and not f.endswith(".tmp")]
    cands = [c for c in cands if os.path.isfile(c) or os.path.isdir(c)]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)
