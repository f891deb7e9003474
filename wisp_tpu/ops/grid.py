"""Functional multi-resolution hash-grid ops (instant-ngp style).

TPU-native counterpart of the reference's CUDA hashgrid kernels + autograd Functions
(wisp/ops/grid.py:16-244 and wisp/csrc/ops/hashgrid_interpolate_cuda.cu). Semantics match the
reference exactly:

* coords live in [-1, 1]^d; per LOD they map to ``(c+1)/2 * res`` clipped to ``res-1-1e-5``
  (reference ops/grid.py:41).
* corner index = spatial hash ``(x*1 ^ y*2654435761 ^ z*805459861) mod 2^bitwidth`` when the
  dense grid would overflow the table, else a dense row-major index
  (reference csrc/ops/hash_utils.cuh:17-39, ops/grid.py:46-52).
* features of the 2^d corners are tri/bi-linearly blended, LOD outputs concatenated
  (reference ops/grid.py:56-75).

Instead of one CUDA launch per LOD with atomicAdd backward, each LOD here is a gather + blend
expressed in jnp inside one jit region; XLA fuses the interpolation chain and derives the
backward scatter-add automatically. A Pallas fused-LOD kernel can swap in underneath this API
without changing callers (see wisp_tpu/ops/pallas/).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Reference PRIMES (wisp/ops/grid.py:14); uint32 arithmetic wraps like the CUDA kernel's.
PRIMES = (1, 2654435761, 805459861)


def _corner_offsets(dim: int) -> np.ndarray:
    """[2^dim, dim] binary corner offsets, ordered to match the reference coefficient order
    (ops/grid.py:56-71): corner index bit k toggles coordinate dim-1-k."""
    corners = np.zeros((2 ** dim, dim), dtype=np.int32)
    for c in range(2 ** dim):
        for d in range(dim):
            corners[c, d] = (c >> (dim - 1 - d)) & 1
    return corners


def hash_index(corner_coords: jax.Array, res: int, codebook_size: int) -> jax.Array:
    """Map integer corner coords [..., dim] to table indices.

    Dense row-major indexing when res^dim fits the table, else the instant-ngp spatial hash
    (reference hash_utils.cuh:17-39).
    """
    dim = corner_coords.shape[-1]
    cc = corner_coords.astype(jnp.uint32)
    if res ** dim <= codebook_size:
        idx = cc[..., 0]
        stride = 1
        for d in range(1, dim):
            stride *= res
            idx = idx + cc[..., d] * jnp.uint32(stride)
    else:
        idx = cc[..., 0] * jnp.uint32(PRIMES[0])
        for d in range(1, dim):
            idx = idx ^ (cc[..., d] * jnp.uint32(PRIMES[d % len(PRIMES)]))
        idx = idx % jnp.uint32(codebook_size)
    return idx.astype(jnp.int32)


def _lod_corners_and_weights(coords: jax.Array, res: int):
    """Shared helper: per-LOD corner integer coords [N, 2^d, d] and blend weights [N, 2^d]."""
    dim = coords.shape[-1]
    x = jnp.clip((coords + 1.0) / 2.0 * res, 0.0, res - 1 - 1e-5)
    c0 = jnp.floor(x)
    frac = x - c0                                     # [N, d]
    offsets = jnp.asarray(_corner_offsets(dim))       # [C, d]
    corners = c0[:, None, :].astype(jnp.int32) + offsets[None]   # [N, C, d]
    # weight per corner: prod over dims of (frac if offset else 1-frac)
    w = jnp.where(offsets[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
    weights = jnp.prod(w, axis=-1)                    # [N, C]
    return corners, weights


def hashgrid(coords: jax.Array,
             resolutions: Sequence[int],
             codebook_bitwidth: int,
             lod_idx: int,
             codebook: jax.Array,
             codebook_first_idx: Sequence[int],
             codebook_sizes: Sequence[int]) -> jax.Array:
    """Multi-LOD hash interpolation (reference ops/grid.py:128-144).

    Args:
        coords: [N, d] in [-1, 1].
        resolutions: static per-LOD grid resolutions.
        codebook: flat feature table [total_feats, F] (all LODs stacked).
        codebook_first_idx / codebook_sizes: static per-LOD offsets/sizes into the table.

    Returns:
        [N, (lod_idx+1) * F] concatenated per-LOD features (fastest-varying = finest LOD last).
    """
    codebook_size = 2 ** codebook_bitwidth
    feats = []
    for i in range(lod_idx + 1):
        res = int(resolutions[i])
        corners, weights = _lod_corners_and_weights(coords, res)
        idx = hash_index(corners, res, codebook_size)                 # [N, C]
        level = codebook[codebook_first_idx[i]:codebook_first_idx[i] + codebook_sizes[i]]
        fs = jnp.take(level, idx, axis=0)                             # [N, C, F]
        feats.append(jnp.sum(fs * weights[..., None].astype(fs.dtype), axis=1))
    return jnp.concatenate(feats, axis=-1)


def hashgrid_query(coords: jax.Array,
                   resolutions: Sequence[int],
                   codebook_bitwidth: int,
                   lod_idx: int,
                   codebook: jax.Array,
                   codebook_first_idx: Sequence[int],
                   codebook_sizes: Sequence[int]) -> jax.Array:
    """Raw 2^d-corner feature query without interpolation (reference ops/grid.py:170-244,
    csrc/ops/hashgrid_query_cuda.cu). Returns [N, num_lods, 2^d, F] stacked over LODs up to
    lod_idx (the reference returns per-LOD [N, 8, F]; we stack for a fixed-shape API)."""
    codebook_size = 2 ** codebook_bitwidth
    out = []
    for i in range(lod_idx + 1):
        res = int(resolutions[i])
        corners, _ = _lod_corners_and_weights(coords, res)
        idx = hash_index(corners, res, codebook_size)
        level = codebook[codebook_first_idx[i]:codebook_first_idx[i] + codebook_sizes[i]]
        out.append(jnp.take(level, idx, axis=0))
    return jnp.stack(out, axis=1)


def grid_interpolate(coords: jax.Array, feats: jax.Array) -> jax.Array:
    """Blend user-supplied per-point corner features.

    Counterpart of the dense 8-corner interpolation kernel (reference ops/grid.py:146-168,
    csrc/ops/grid_interpolate_cuda.cu): ``coords`` [N, d] in [0, 1]^d are the fractional
    position inside the cell, ``feats`` [N, 2^d, F] the corner features.
    """
    dim = coords.shape[-1]
    offsets = jnp.asarray(_corner_offsets(dim))
    w = jnp.where(offsets[None].astype(bool), coords[:, None, :], 1.0 - coords[:, None, :])
    weights = jnp.prod(w, axis=-1)
    return jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=1)


def hashgrid_naive(coords, resolutions, codebook_bitwidth, lod_idx, codebook,
                   codebook_sizes, codebook_first_idx):
    """Alias with the reference's naive-impl argument order (ops/grid.py:16-75), used by
    kernel-vs-reference unit tests."""
    return hashgrid(coords, resolutions, codebook_bitwidth, lod_idx, codebook,
                    codebook_first_idx, codebook_sizes)
