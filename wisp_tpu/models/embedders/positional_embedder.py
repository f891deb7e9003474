"""Positional (Fourier) embedding — reference wisp/models/embedders/positional_embedder.py:15-100.

Pure function of coords: sin/cos over log- or linearly-spaced frequency bands, optionally
concatenating the raw input. Bands are baked as a static tuple (non-learnable in the reference
too), so the embedder is jit-cache-friendly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.module import Module


class PositionalEmbedder(Module):
    def __init__(self, num_freq: int, max_freq_log2: float, log_sampling: bool = True,
                 include_input: bool = True, input_dim: int = 3):
        self.num_freq = num_freq
        self.max_freq_log2 = max_freq_log2
        self.log_sampling = log_sampling
        self.include_input = include_input
        self.input_dim = input_dim

        if log_sampling:
            bands = 2.0 ** np.linspace(0.0, max_freq_log2, num=num_freq)
        else:
            bands = np.linspace(1.0, 2.0 ** max_freq_log2, num=num_freq)
        self.bands = tuple(float(b) for b in bands)

        self.out_dim = (input_dim if include_input else 0) + num_freq * input_dim * 2

    def __call__(self, coords):
        """[N, input_dim] -> [N, out_dim]; matches the reference's interleaving
        (winded sin block then cos block, positional_embedder.py:52-66)."""
        n = coords.shape[0]
        bands = jnp.asarray(self.bands, dtype=coords.dtype)
        winded = (coords[:, None, :] * bands[None, :, None]).reshape(n, -1)
        encoded = jnp.concatenate([jnp.sin(winded), jnp.cos(winded)], axis=-1)
        if self.include_input:
            encoded = jnp.concatenate([coords, encoded], axis=-1)
        return encoded

    def public_properties(self) -> Dict[str, Any]:
        return {
            "Output Dim": self.out_dim,
            "Num. Frequencies": self.num_freq,
            "Max Frequency": f"2^{self.max_freq_log2}",
            "Include Input": self.include_input,
        }


def get_positional_embedder(frequencies: int, input_dim: int = 3, include_input: bool = True):
    """(embedder, out_dim) with bands [2^0 .. 2^(frequencies-1)]
    (reference positional_embedder.py:86-100)."""
    encoder = PositionalEmbedder(frequencies, frequencies - 1, input_dim=input_dim,
                                 include_input=include_input)
    return encoder, encoder.out_dim
