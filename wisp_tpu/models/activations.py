"""Activation zoo (reference wisp/models/activations/basic_activations.py:13-80)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity(x):
    return x


def relu(x):
    return jax.nn.relu(x)


def sin(x):
    return jnp.sin(x)


def fullsort(x):
    """Sorts feature channels — a Lipschitz-1 'activation' (reference basic_activations.py:13-32)."""
    return jnp.sort(x, axis=-1)


def minmax(x):
    """Group-sort with groups of 2: pairwise (min, max) over channel pairs
    (reference basic_activations.py:35-56)."""
    n = x.shape[-1]
    pairs = x.reshape(*x.shape[:-1], n // 2, 2)
    lo = jnp.min(pairs, axis=-1)
    hi = jnp.max(pairs, axis=-1)
    return jnp.concatenate([lo, hi], axis=-1)


_ACTIVATIONS = {
    "none": identity,
    "identity": identity,
    "relu": relu,
    "sin": sin,
    "fullsort": fullsort,
    "minmax": minmax,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "gelu": jax.nn.gelu,
    "leaky_relu": jax.nn.leaky_relu,
}


def get_activation_class(name: str):
    """Activation lookup by name (reference basic_activations.py:59-80)."""
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}; options: {sorted(_ACTIVATIONS)}")
