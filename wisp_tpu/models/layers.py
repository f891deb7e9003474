"""Linear layer zoo: plain + weight-normalized variants.

Counterpart of reference wisp/models/layers.py:51-108 (FrobeniusLinear, L1/LinfLinear,
SpectralLinear via torch's spectral_norm). Here each layer is a pytree Module whose __call__
applies the normalization functionally — the TPU-friendly formulation (no parametrization
hooks; XLA folds the norm into the matmul epilogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wisp_tpu.core.module import Module


def _linear_init(key, in_dim: int, out_dim: int, bias: bool, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both weight and bias."""
    bound = 1.0 / jnp.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (out_dim, in_dim), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound) if bias else None
    return w, b


class Linear(Module):
    """y = x @ W^T + b with torch Linear weight convention [out, in]."""

    def __init__(self, in_dim: int, out_dim: int, bias: bool = True, *, key):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.weight, self.bias = _linear_init(key, in_dim, out_dim, bias)

    def effective_weight(self):
        return self.weight

    def __call__(self, x):
        w = self.effective_weight()
        y = x @ w.T.astype(x.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y


class FrobeniusLinear(Linear):
    """Weight normalized by its Frobenius norm (reference layers.py:51-63)."""

    def effective_weight(self):
        return self.weight / jnp.maximum(jnp.linalg.norm(self.weight), 1e-12)


class L1Linear(Linear):
    """Weight normalized by the L1-induced operator norm = max column abs-sum
    (reference layers.py:66-77)."""

    def effective_weight(self):
        norm = jnp.max(jnp.sum(jnp.abs(self.weight), axis=0))
        return self.weight / jnp.maximum(norm, 1e-12)


class LinfLinear(Linear):
    """Weight normalized by the Linf-induced operator norm = max row abs-sum
    (reference layers.py:80-91)."""

    def effective_weight(self):
        norm = jnp.max(jnp.sum(jnp.abs(self.weight), axis=1))
        return self.weight / jnp.maximum(norm, 1e-12)


class SpectralLinear(Linear):
    """Weight normalized by an estimate of its spectral norm via one-shot power iteration
    on the fly (reference layers.py:94-99 uses torch spectral_norm's persistent u/v;
    a few fixed iterations inside jit give an equivalent bound)."""

    _POWER_ITERS = 8

    def effective_weight(self):
        w = self.weight
        v = jnp.ones((w.shape[1],), w.dtype) / jnp.sqrt(w.shape[1])
        for _ in range(self._POWER_ITERS):
            u = w @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
            v = w.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        sigma = u @ w @ v
        return w / jnp.maximum(sigma, 1e-12)


_LAYERS = {
    "none": Linear,
    "linear": Linear,
    "frobenius": FrobeniusLinear,
    "l_1": L1Linear,
    "l1": L1Linear,
    "l_inf": LinfLinear,
    "linf": LinfLinear,
    "spectral": SpectralLinear,
}


def get_layer_class(name: str):
    """Layer lookup by name (reference layers.py:102-108)."""
    try:
        return _LAYERS[name]
    except KeyError:
        raise ValueError(f"Unknown layer type {name!r}; options: {sorted(_LAYERS)}")
