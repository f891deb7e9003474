"""BasicDecoder — the workhorse MLP (reference wisp/models/decoders/basic_decoders.py:16-139)
plus weight-transform initializers (reference :142-200).

MLPs are where the TPU's MXU earns its keep: __call__ is a chain of [N, in] @ [in, out] matmuls
that XLA tiles onto the systolic array; inputs may arrive in bf16 under mixed precision while
weights stay fp32 (matmuls run with preferred fp32 accumulation via the dtype promotion in
Linear).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.module import Module
from wisp_tpu.models.layers import Linear


class BasicDecoder(Module):
    """Configurable MLP with optional skip connections."""

    def __init__(self,
                 input_dim: int,
                 output_dim: int,
                 activation: Callable,
                 bias: bool,
                 layer: type = Linear,
                 num_layers: int = 1,
                 hidden_dim: int = 128,
                 skip: Optional[Sequence[int]] = None,
                 *,
                 key):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.activation = activation
        self.bias = bias
        self.layer = layer
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.skip = tuple(skip) if skip else ()

        keys = jax.random.split(key, num_layers + 1)
        layers: List[Linear] = []
        for i in range(num_layers):
            if i == 0:
                layers.append(layer(input_dim, hidden_dim, bias=bias, key=keys[i]))
            elif i in self.skip:
                layers.append(layer(hidden_dim + input_dim, hidden_dim, bias=bias, key=keys[i]))
            else:
                layers.append(layer(hidden_dim, hidden_dim, bias=bias, key=keys[i]))
        self.layers = layers
        self.lout = layer(hidden_dim, output_dim, bias=bias, key=keys[-1])
        self.compute_dtype = None  # set to jnp.bfloat16 for AMP (reference autocast parity)

    def __call__(self, x, return_h: bool = False):
        """[..., input_dim] -> [..., output_dim] (reference basic_decoders.py:73-103).

        Note the reference's skip quirk: the skip concat happens *after* the skip layer runs on
        h alone, feeding [x, h] to the *next* layer — reproduced faithfully.
        """
        in_dtype = x.dtype
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        h = x
        for i, l in enumerate(self.layers):
            if i == 0:
                h = self.activation(l(x))
            elif i in self.skip:
                h = self.activation(l(h))
                h = jnp.concatenate([x, h], axis=-1)
            else:
                h = self.activation(l(h))
        out = self.lout(h)
        if self.compute_dtype is not None:
            out = out.astype(in_dtype)
            h = h.astype(in_dtype)
        if return_h:
            return out, h
        return out

    def initialize(self, get_weight: Callable) -> "BasicDecoder":
        """Re-initialize all layer weights through ``get_weight(weight) -> weight``
        (reference basic_decoders.py:105-120). Functional: returns a new decoder."""
        new_layers = [l.replace(weight=get_weight(l.weight)) for l in self.layers]
        new_lout = self.lout.replace(weight=get_weight(self.lout.weight))
        return self.replace(layers=new_layers, lout=new_lout)

    def public_properties(self) -> Dict[str, Any]:
        return {
            "Input Dim": self.input_dim,
            "Hidden Dim": self.hidden_dim,
            "Output Dim": self.output_dim,
            "Num. Layers": self.num_layers,
            "Layer Type": self.layer.__name__,
            "Activation": getattr(self.activation, "__name__", str(self.activation)),
            "Bias": self.bias,
            "Skip Connections": self.skip,
        }


# ---------------------------------------------------------------------------------------------
# Weight-transform initializers (reference basic_decoders.py:142-200)
# ---------------------------------------------------------------------------------------------

def identity_init(w):
    return w


def orthonormal_init(w):
    """Random orthonormal rows (reference uses scipy ortho_group)."""
    from scipy.stats import ortho_group
    n = max(w.shape)
    m = ortho_group.rvs(dim=n)[: w.shape[0], : w.shape[1]]
    return jnp.asarray(m, dtype=w.dtype)


def svd_init(w):
    """Project onto the nearest orthonormal matrix via SVD (reference :159-170)."""
    u, _, vt = np.linalg.svd(np.asarray(w), full_matrices=False)
    return jnp.asarray(u @ vt, dtype=w.dtype)


def spectral_init(w):
    """Normalize by the spectral norm (reference :173-184)."""
    s = np.linalg.norm(np.asarray(w), ord=2)
    return jnp.asarray(np.asarray(w) / max(s, 1e-12), dtype=w.dtype)


def average_init(w):
    """Rows replaced by the mean row (reference :187-200)."""
    m = np.asarray(w)
    return jnp.asarray(np.broadcast_to(m.mean(axis=0, keepdims=True), m.shape), dtype=w.dtype)


def get_weight_transform(name: str):
    transforms = {
        "none": identity_init,
        "identity": identity_init,
        "orthonormal": orthonormal_init,
        "svd": svd_init,
        "spectral": spectral_init,
        "average": average_init,
    }
    try:
        return transforms[name]
    except KeyError:
        raise ValueError(f"Unknown weight transform {name!r}; options: {sorted(transforms)}")
