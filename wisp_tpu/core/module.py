"""Pytree module base class — the TPU-native replacement for the reference's ``WispModule``
(reference: wisp/core/wisp_module.py:14-40).

The reference builds on ``torch.nn.Module`` (mutable parameter registry + hooks). On TPU the
idiomatic unit is a *pytree*: modules flatten into (arrays, static-config) so they can flow
through ``jax.jit`` / ``jax.grad`` / ``jax.tree_util`` directly. This module implements a
minimal equinox-style base class:

* Any attribute whose leaves contain ``jax.Array`` / ``np.ndarray`` is *data* (traced, learnable
  or buffer state).
* Everything else (ints, floats, strings, callables, nested config) is *static* metadata and
  participates in the jit cache key.
* ``replace(**kwargs)`` produces a functionally-updated copy (modules are treated as immutable
  inside transformed code).

Subclasses may define arbitrary ``__init__`` logic (table allocation, octree construction, ...);
unflattening bypasses ``__init__`` via ``object.__new__``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.tree_util as jtu


def _contains_array(v) -> bool:
    """True if any pytree leaf of ``v`` is an array (jax or numpy)."""
    if isinstance(v, (jax.Array, np.ndarray, Module)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_contains_array(x) for x in v)
    if isinstance(v, dict):
        return any(_contains_array(x) for x in v.values())
    return False


class _Static:
    """Hashable wrapper for static (aux) values, with best-effort equality.

    jit caches key on aux data equality; config values are usually hashable primitives, but we
    fall back to ``repr`` for exotic ones so flatten never raises.
    """

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def _key(self):
        try:
            hash(self.value)
            return self.value
        except TypeError:
            return repr(self.value)

    def __eq__(self, other):
        return isinstance(other, _Static) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"_Static({self.value!r})"


def _flatten_module(obj: "Module"):
    keys = sorted(obj.__dict__.keys())
    data_keys, data_vals, meta = [], [], []
    for k in keys:
        v = obj.__dict__[k]
        if _contains_array(v):
            data_keys.append(k)
            data_vals.append(v)
        else:
            meta.append((k, _Static(v)))
    return data_vals, (tuple(data_keys), tuple(meta))


def _flatten_module_with_keys(obj: "Module"):
    vals, aux = _flatten_module(obj)
    keyed = [(jtu.GetAttrKey(k), v) for k, v in zip(aux[0], vals)]
    return keyed, aux


def _unflatten_module(cls, aux, data_vals):
    data_keys, meta = aux
    obj = object.__new__(cls)
    for k, v in zip(data_keys, data_vals):
        object.__setattr__(obj, k, v)
    for k, sv in meta:
        object.__setattr__(obj, k, sv.value)
    return obj


class Module:
    """Base class for all framework modules (grids, neural fields, tracers, decoders...).

    Mirrors the introspection surface of the reference's WispModule
    (wisp/core/wisp_module.py:14-40): ``name()`` and ``public_properties()`` feed logging and
    (eventually) interactive GUI property panels.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jtu.register_pytree_with_keys(
            cls,
            _flatten_module_with_keys,
            lambda aux, vals: _unflatten_module(cls, aux, vals),
            flatten_func=_flatten_module,
        )

    # -- reference WispModule API ------------------------------------------------------------
    def name(self) -> str:
        return type(self).__name__

    def public_properties(self) -> dict:
        """Dict of user-facing properties for logs / GUI (wisp_module.py:29-40)."""
        return {}

    # -- functional update -------------------------------------------------------------------
    def replace(self, **kwargs) -> "Module":
        """Return a copy with the given attributes replaced (functional update)."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        for k, v in kwargs.items():
            if k not in self.__dict__:
                raise AttributeError(f"{type(self).__name__} has no attribute {k!r}")
            obj.__dict__[k] = v
        return obj

    def __repr__(self):
        props = ", ".join(f"{k}={v}" for k, v in self.public_properties().items())
        return f"{type(self).__name__}({props})"


def module_leaves_with_paths(tree):
    """Flatten a module tree to [(path_string, leaf)] — used for param-group partitioning
    (reference optimizer groups 'grid' vs 'decoder', wisp/trainers/base_trainer.py:205-246)."""
    flat, _ = jtu.tree_flatten_with_path(tree)
    return [(jtu.keystr(path), leaf) for path, leaf in flat]
