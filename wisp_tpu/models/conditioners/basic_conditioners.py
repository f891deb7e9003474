"""FiLM conditioners (reference wisp/models/conditioners/basic_conditioners.py:11-105;
unused by the reference mains but part of the extension API): feature-wise linear modulation
of decoder activations by a conditioning code."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from wisp_tpu.core.module import Module
from wisp_tpu.models.layers import Linear


class FiLM(Module):
    """gamma/beta generator: condition code [N, cond_dim] -> scale+shift for a feature
    vector of width feature_dim."""

    def __init__(self, cond_dim: int, feature_dim: int, *, key):
        self.cond_dim = cond_dim
        self.feature_dim = feature_dim
        self.layer = Linear(cond_dim, 2 * feature_dim, bias=True, key=key)

    def __call__(self, features, condition):
        gb = self.layer(condition)
        gamma, beta = gb[..., :self.feature_dim], gb[..., self.feature_dim:]
        return features * (1.0 + gamma) + beta

    def public_properties(self) -> Dict[str, Any]:
        return {"Condition Dim": self.cond_dim, "Feature Dim": self.feature_dim}


class FiLMConditioner(Module):
    """Per-layer FiLM modulation over a BasicDecoder-shaped MLP
    (reference basic_conditioners.py:58-105)."""

    def __init__(self, cond_dim: int, hidden_dim: int, num_layers: int, *, key):
        keys = jax.random.split(key, num_layers)
        self.films = [FiLM(cond_dim, hidden_dim, key=k) for k in keys]

    def __call__(self, hidden_states, condition):
        """Modulate a list of per-layer hidden activations."""
        return [film(h, condition) for film, h in zip(self.films, hidden_states)]
