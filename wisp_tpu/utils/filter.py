"""Pytree filtering utilities for differentiating through module trees.

Modules carry both differentiable float arrays (features, MLP weights) and structural arrays
(octree words, pyramids, occupancy ints). ``jax.grad`` only accepts inexact inputs, so trainers
differentiate through the float partition and substitute back. This replaces the role of
torch's ``requires_grad`` / named_parameters split (reference wisp/trainers/base_trainer.py:
205-246).

Because Module flattening is content-dependent (an attribute holding ``None`` flattens as
static), partitioning must preserve leaf positions. The utilities here therefore work in
"path-dict" form: the tree is flattened once, its array leaves split into two path-keyed
dicts (inexact = trainable, rest = structural), and reassembled by substitution against the
original treedef.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np


def is_inexact_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) and jnp.issubdtype(x.dtype, jnp.inexact)


def _child(obj, key):
    """Follow one tree_util key entry down the object graph (best-effort)."""
    try:
        if isinstance(key, jtu.GetAttrKey):
            return getattr(obj, key.name, None)
        if isinstance(key, jtu.SequenceKey):
            return obj[key.idx]
        if isinstance(key, jtu.DictKey):
            return obj[key.key]
    except (TypeError, IndexError, KeyError):
        return None
    return None  # FlattenedIndexKey etc.: opaque — stop descending


def buffer_paths(tree) -> frozenset:
    """Paths of leaves that are non-trainable *buffers*.

    Float arrays are trainable by default (the reference marks parameters via
    ``nn.Parameter``; our pytree modules have no registry), so modules opt OUT:

    * a class with ``__trainable__ = False`` marks its whole subtree as buffers
      (accel structures: octree words, occupancy bitfields, density EMA fields);
    * a class listing attr names in ``__buffers__`` marks just those attrs
      (e.g. ``BLASGrid.occupancy`` — the pruning density EMA).

    Without this, structural float state leaks into the optimizer (wasted Adam
    moments, zero-grad bytes on the dp all-reduce) and — worse — gets DONATED by
    the jitted train step, deleting arrays the caller may share across pipelines
    (measured: bench cold phase crashed on the shared blas ``cell_density``).
    """
    flat, _ = jtu.tree_flatten_with_path(tree)
    out = set()
    for path, _leaf in flat:
        obj = tree
        is_buf = getattr(type(obj), "__trainable__", True) is False
        for key in path:
            if not is_buf and isinstance(key, jtu.GetAttrKey) \
                    and key.name in getattr(type(obj), "__buffers__", ()):
                is_buf = True
                break
            obj = _child(obj, key)
            if obj is None:
                break
            if getattr(type(obj), "__trainable__", True) is False:
                is_buf = True
                break
        if is_buf:
            out.add(jtu.keystr(path))
    return frozenset(out)


class TreeSpec:
    """Frozen flattening of a module tree: treedef + leaf paths, with the leaves split into
    (diff, nondiff) path-keyed dicts. Leaves marked as buffers (``__trainable__`` /
    ``__buffers__``, see :func:`buffer_paths`) go to nondiff regardless of dtype."""

    def __init__(self, tree, pred: Callable[[Any], bool] = is_inexact_array,
                 respect_buffers: bool = True):
        flat, self.treedef = jtu.tree_flatten_with_path(tree)
        self.paths = tuple(jtu.keystr(p) for p, _ in flat)
        bufs = buffer_paths(tree) if respect_buffers else frozenset()
        self.diff: Dict[str, Any] = {}
        self.nondiff: Dict[str, Any] = {}
        for path, (_, leaf) in zip(self.paths, flat):
            (self.diff if pred(leaf) and path not in bufs
             else self.nondiff)[path] = leaf

    def unflatten(self, diff: Dict[str, Any], nondiff: Dict[str, Any] = None):
        nondiff = self.nondiff if nondiff is None else nondiff
        leaves = [diff[p] if p in diff else nondiff[p] for p in self.paths]
        return jtu.tree_unflatten(self.treedef, leaves)


def partition(tree, pred: Callable[[Any], bool] = is_inexact_array
              ) -> Tuple[Dict[str, Any], TreeSpec]:
    """Split a module tree into (diff_dict, spec); ``spec.unflatten(diff_dict)`` inverts."""
    spec = TreeSpec(tree, pred)
    return dict(spec.diff), spec


def filter_value_and_grad(fn, has_aux: bool = False):
    """``jax.value_and_grad`` over only the inexact-array leaves of the first argument.
    Returns ((value, grad_tree)) where grad_tree mirrors the input module tree with zeros at
    non-differentiable positions."""
    def wrapped(module, *args, **kwargs):
        diff, spec = partition(module)

        def inner(d):
            return fn(spec.unflatten(d), *args, **kwargs)

        out = jax.value_and_grad(inner, has_aux=has_aux)(diff)
        value, grads_dict = out
        zeros_nondiff = {p: jnp.zeros_like(v) if is_inexact_array(v) else v
                         for p, v in spec.nondiff.items()}
        return value, spec.unflatten(grads_dict, zeros_nondiff)
    return wrapped


def filter_grad(fn, has_aux: bool = False):
    def wrapped(module, *args, **kwargs):
        return filter_value_and_grad(fn, has_aux=has_aux)(module, *args, **kwargs)[1]
    return wrapped
