"""Numerical anomaly checking.

SURVEY.md §5.2: the reference's only anomaly tooling is torch's detect_anomaly in the image
app (reference main_image.py:46-47); CUDA atomics were its only race surface, which JAX's
functional model removes. The TPU-native equivalents:

* ``enable_nan_checks()`` — jax's debug_nans mode (fails fast on the op producing a NaN).
* ``checked(fn)`` — checkify-wrapped jittable fn accumulating div-by-zero/NaN/OOB errors
  without aborting the device program (usable inside production steps).
* ``assert_all_finite(tree)`` — host-side sweep of a pytree (post-step validation).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def enable_nan_checks(enable: bool = True) -> None:
    """Global debug-nans toggle (torch.autograd.detect_anomaly equivalent)."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Wrap a jittable fn with checkify error accumulation; returns (errors, out) and logs
    any captured error host-side when materialized."""
    from jax.experimental import checkify

    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapped(*args, **kwargs):
        errors, out = checked_fn(*args, **kwargs)
        return errors, out

    return wrapped


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check over all float leaves; raises with the offending path."""
    import jax.tree_util as jtu
    flat, _ = jtu.tree_flatten_with_path(tree)
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jtu.keystr(path)}")
