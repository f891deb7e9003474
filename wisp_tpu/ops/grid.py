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

TPU layout: all per-corner intermediates are kept **corner-major, sample-last** ([2^d, N]) so
the large sample axis lands on the 128-lane dimension. The naive [N, 2^d, F] layout pads the
tiny trailing dims 16-64x and blows HBM at production sample counts (measured: 19.8 GB for a
2M-sample step vs <1 GB in this layout). Rematerialization is per-LOD and sample-count-aware
(see the policy note above ``_hashgrid_impl``); the reference's CUDA backward likewise
recomputes indices rather than storing them (hashgrid_interpolate_cuda.cu:84-212).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Reference PRIMES (wisp/ops/grid.py:14); uint32 arithmetic wraps like the CUDA kernel's.
PRIMES = (1, 2654435761, 805459861)


@jax.custom_vjp
def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather ``table[idx]`` whose backward scatters PER COLUMN.

    table: [S, F], idx: [N] int32 -> [N, F].

    Forward is XLA's fast row gather (~6-18 ns/index on TPU v5e). JAX's default gather
    transpose emits a windowed row scatter-add that measures **42 ns/index**, while a rank-1
    (single-column) scatter-add runs at **8 ns/index** (probe: 2.35M indices into [524288, 2]:
    98.7 ms row scatter vs 19.0 ms/column flat scatter). So the custom backward does F
    independent 1-D scatter-adds and stacks — 2.6x faster for F=2, more for F=1.
    """
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(res, g):
    idx, s = res
    cols = [jnp.zeros((s,), g.dtype).at[idx].add(g[:, f]) for f in range(g.shape[-1])]
    dtable = jnp.stack(cols, axis=-1)
    return dtable, np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def interp_rows_stoch(table: jax.Array, idx: jax.Array, weights: jax.Array,
                      cidx: jax.Array) -> jax.Array:
    """Trilinear row interpolation with a STOCHASTIC single-corner backward.

    table: [S, F]; idx: [C, N] corner rows; weights: [C, N] (columns sum to 1);
    cidx: [N] — one corner row per sample, pre-drawn with probability = its weight.

    Forward is exact (identical to the gather_rows path). Backward scatters the FULL
    cotangent g to the one drawn corner: E[dtable] = sum_c w_c * g = the exact gradient
    (unbiased — the estimator trades per-step variance for a 2^d-fold cut in backward
    scatter indices, the dominant step cost on TPU: the column scatter-add runs at
    ~8 ns/index and the exact backward pays C*F indices per sample per LOD). Variance
    averages out across the many samples touching each table row per step; quality is
    gated by tests/apps/test_nerf.py::test_nerf_fast_path_quality and the lego-proxy gate.
    No reference counterpart (the CUDA backward atomicAdds all 8 corners,
    hashgrid_interpolate_cuda.cu:84-212) — this is a TPU-economics redesign.
    """
    c, n = idx.shape
    f = table.shape[-1]
    rows = table[idx.reshape(-1)].reshape(c, n, f)
    return jnp.sum(rows * weights[..., None], axis=0)


def _irs_fwd(table, idx, weights, cidx):
    return interp_rows_stoch(table, idx, weights, cidx), \
        (cidx, table.shape[0], idx.shape)


def _irs_bwd(res, g):
    cidx, s, idx_shape = res
    cols = [jnp.zeros((s,), g.dtype).at[cidx].add(g[:, f]) for f in range(g.shape[-1])]
    dtable = jnp.stack(cols, axis=-1)
    return (dtable,
            np.zeros(idx_shape, dtype=jax.dtypes.float0),
            jnp.zeros(idx_shape, dtype=g.dtype),
            np.zeros(idx_shape[1:], dtype=jax.dtypes.float0))


interp_rows_stoch.defvjp(_irs_fwd, _irs_bwd)


def _corner_offsets(dim: int) -> np.ndarray:
    """[2^dim, dim] binary corner offsets, ordered to match the reference coefficient order
    (ops/grid.py:56-71): corner index bit k toggles coordinate dim-1-k."""
    corners = np.zeros((2 ** dim, dim), dtype=np.int32)
    for c in range(2 ** dim):
        for d in range(dim):
            corners[c, d] = (c >> (dim - 1 - d)) & 1
    return corners


def hash_index(corner_coords: jax.Array, res: int, codebook_size: int) -> jax.Array:
    """Map integer corner coords [..., dim] to table indices (dense row-major when res^dim
    fits the table, else the instant-ngp spatial hash — reference hash_utils.cuh:17-39)."""
    dim = corner_coords.shape[-1]
    axes = [corner_coords[..., d] for d in range(dim)]
    return _hash_index_axes(axes, res, codebook_size)


def _hash_index_axes(axes, res: int, codebook_size: int) -> jax.Array:
    """Same as hash_index but taking per-axis integer arrays (layout-preserving)."""
    dim = len(axes)
    cc = [a.astype(jnp.uint32) for a in axes]
    if res ** dim <= codebook_size:
        idx = cc[0]
        stride = 1
        for d in range(1, dim):
            stride *= res
            idx = idx + cc[d] * jnp.uint32(stride)
    else:
        idx = cc[0] * jnp.uint32(PRIMES[0])
        for d in range(1, dim):
            idx = idx ^ (cc[d] * jnp.uint32(PRIMES[d % len(PRIMES)]))
        idx = idx % jnp.uint32(codebook_size)
    return idx.astype(jnp.int32)


def _lod_features(coords_axes, res: int, codebook_size: int, level_table: jax.Array,
                  stoch_u=None):
    """One LOD's interpolated features.

    Args:
        coords_axes: list of d arrays [N] (the sample coords, split per axis).
        level_table: [S_l, F] features of this LOD.
        stoch_u: optional [N] uniforms — when given, the backward uses the stochastic
            single-corner estimator (see interp_rows_stoch); forward is identical.

    Returns:
        [F] list of [N] feature arrays (to be stacked by the caller).

    TPU cost model (measured): XLA's random gather is bound by *index count* (~10 ns/index),
    not bytes — so features are fetched as whole rows (one gather index per corner yields all
    F features) rather than per-column, halving the dominant cost; index/weight math stays
    corner-major [C, N] (sample axis on lanes).
    """
    dim = len(coords_axes)
    offsets = _corner_offsets(dim)  # host constant [C, d]
    c0, frac = [], []
    for a in coords_axes:
        x = jnp.clip((a + 1.0) * (res / 2.0), 0.0, res - 1 - 1e-5)
        f = jnp.floor(x)
        c0.append(f.astype(jnp.int32))
        frac.append(x - f)

    # corner indices + weights as [C, N] (sample axis last → lane-dim = N)
    idx_axes = []
    weights = None
    for d in range(dim):
        off = jnp.asarray(offsets[:, d])[:, None]                  # [C, 1]
        idx_axes.append(c0[d][None, :] + off)                      # [C, N]
        wd = jnp.where(off.astype(bool), frac[d][None, :], 1.0 - frac[d][None, :])
        weights = wd if weights is None else weights * wd          # [C, N]

    idx = _hash_index_axes(idx_axes, res, codebook_size)           # [C, N]
    c, n = idx.shape
    f_dim = level_table.shape[-1]
    if stoch_u is not None:
        # draw one corner per sample with prob = its trilinear weight (weights columns
        # sum to 1; scale u by the actual sum for numerical safety)
        wcum = jnp.cumsum(weights, axis=0)                         # [C, N]
        chosen = jnp.sum(wcum < stoch_u[None, :] * wcum[-1], axis=0)
        cidx = jnp.take_along_axis(idx, jnp.minimum(chosen, c - 1)[None, :],
                                   axis=0)[0]
        blended = interp_rows_stoch(level_table, idx, weights, cidx)
        return [blended[:, f] for f in range(f_dim)]
    rows = gather_rows(level_table, idx.reshape(-1))               # [C*N, F] one gather
    rows = rows.reshape(c, n, f_dim) * weights[..., None]          # [C, N, F]
    blended = jnp.sum(rows, axis=0)                                # [N, F]
    return [blended[:, f] for f in range(f_dim)]


_MM_DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32, "f32_highest": jnp.float32}

# Cap on N*res^2 for the dense-matmul interp path (the [N, res^2] weight matrix is ~2 GB
# bf16 at this cap; beyond it, gathers win on memory). Full-image renders at 2M samples
# still take the matmul for their smallest LODs and gathers for the rest.
_DENSE_MM_MAX_ELEMS = 2 ** 30


def _axis_weight(c0: jax.Array, frac: jax.Array, width: int, dtype) -> jax.Array:
    """[N, width] linear-interp weight rows with exactly 2 nonzeros (1-f at c0, f at c0+1),
    built by iota-compare (no scatter indices)."""
    io = jnp.arange(width, dtype=jnp.int32)[None, :]
    lo = (io == c0[:, None]).astype(dtype) * (1.0 - frac[:, None]).astype(dtype)
    hi = (io == (c0[:, None] + 1)).astype(dtype) * frac[:, None].astype(dtype)
    return lo + hi


def _lod_features_dense_matmul(coords_axes, res: int, level_table: jax.Array,
                               mode: str, stoch_u=None):
    """Dense-table LOD interpolation as ONE MXU matmul instead of 2^d gathers + scatters.

    TPU-specific design (no reference counterpart — the CUDA kernel always gathers): for a
    dense row-major table the trilinear interp is a linear map with *factorable* weights,
        out[n,f] = Σ_xyz Wx[n,x]·Wy[n,y]·Wz[n,z]·G[x,y,z,f],
    so fusing the two leading axes gives out1 = (Wx⊗Wy) @ G.reshape(X·Y, Z·F) — a single
    [N, X·Y]@[X·Y, Z·F] matmul (backward = the transposed matmul; ZERO gather/scatter
    indices) — followed by a per-sample z-reduction on the VPU. Measured on TPU v5e at
    N=131072, F=2 (fwd+bwd per LOD): res 16: 12.5→3.0 ms, res 32: 15.6→4.3 ms,
    res 64: 27.8→10.0 ms, res 80: 57.8→13.3 ms vs the gather path.

    ``mode``: 'bf16' (fastest, ~2e-2 abs err on unit-scale features), 'f32' (XLA default
    TPU precision — still bf16 passes), 'f32_highest' (exact, ~2× the bf16 cost).
    """
    dim = len(coords_axes)
    n = coords_axes[0].shape[0]
    # The [N, res^2] weight matrix is the matmul's price: at res 80 and N=2M (an
    # uncompacted full-image render) it is 26 GB and OOMs HBM. Above this sample count
    # the 8-gather path is the memory-sane choice (fwd-only renders pay ~10 ns/idx).
    if n * res * res > _DENSE_MM_MAX_ELEMS:
        # gather fallback keeps the stochastic backward if the caller uses it — at
        # trainer steady-state shapes (N ≈ 0.5M) the res 51-80 LODs land here, and an
        # exact backward would pay 2 column scatters per corner (~22M extra indices per
        # step at the flagship config)
        codebook_size = level_table.shape[0]
        return _lod_features(coords_axes, res, codebook_size, level_table, stoch_u)
    dtype = _MM_DTYPES[mode]
    precision = jax.lax.Precision.HIGHEST if mode == "f32_highest" else None
    f_dim = level_table.shape[-1]

    c0, frac = [], []
    for a in coords_axes:
        x = jnp.clip((a + 1.0) * (res / 2.0), 0.0, res - 1 - 1e-5)
        f = jnp.floor(x)
        c0.append(f.astype(jnp.int32))   # <= res-2, so c0+1 is always in-range
        frac.append(x - f)

    # Dense row-major index is x + y·res + z·res² (_hash_index_axes), i.e. the table viewed
    # as a box is [Z, Y, X, F] with axis 0 of `coords_axes` (x) FASTEST. The matmul fuses
    # the two *slowest* axes; the fastest axis is the trailing per-sample reduction.
    if dim == 3:
        wz = _axis_weight(c0[2], frac[2], res, dtype)
        wy = _axis_weight(c0[1], frac[1], res, dtype)
        wx = _axis_weight(c0[0], frac[0], res, jnp.float32)
        wzy = (wz[:, :, None] * wy[:, None, :]).reshape(n, res * res)
        out1 = jax.lax.dot_general(
            wzy, level_table.astype(dtype).reshape(res * res, res * f_dim),
            (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)
        blended = jnp.sum(out1.reshape(n, res, f_dim) * wx[:, :, None], axis=1)
    elif dim == 2:
        wy = _axis_weight(c0[1], frac[1], res, dtype)
        wx = _axis_weight(c0[0], frac[0], res, jnp.float32)
        out1 = jax.lax.dot_general(
            wy, level_table.astype(dtype).reshape(res, res * f_dim),
            (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)
        blended = jnp.sum(out1.reshape(n, res, f_dim) * wx[:, :, None], axis=1)
    else:
        raise NotImplementedError(f"dense matmul path supports dim 2/3, got {dim}")
    return [blended[:, f] for f in range(f_dim)]


# Per-LOD rematerialization policy (replaces the round-1 whole-chain jax.checkpoint):
# * dense-matmul LODs ALWAYS checkpoint — their [N, res^2] weight-matrix residual is the
#   memory hog (~1.3 GB at N=42k over the 16->512 ladder) and rebuilding it is cheap
#   elementwise iota-compare work.
# * hash-gather LODs checkpoint only above _HASH_REMAT_THRESHOLD samples — below it their
#   residuals (idx/weights/rows, ~33 MB per LOD at N=262k) fit comfortably, and skipping
#   the recompute saves re-paying every forward gather index in the backward (measured
#   12.7 ms of the 37 ms backward at the flagship bench config). Above it (the
#   no-compaction [R*S] path, 2M+ samples) residuals would reach multiple GB -> recompute.
_HASH_REMAT_THRESHOLD = 2 ** 19

_lod_features_ckpt = partial(jax.checkpoint, static_argnums=(1, 2))(_lod_features)
_lod_features_dense_matmul_ckpt = partial(jax.checkpoint, static_argnums=(1, 3))(
    _lod_features_dense_matmul)


def _fold_u(u0, i):
    """Decorrelate the per-sample corner draw across LODs (golden-ratio shift)."""
    u = u0 + 0.61803398875 * (i + 1)
    return u - jnp.floor(u)


def _hashgrid_impl(coords, resolutions, codebook_bitwidth, lod_idx, codebook,
                   codebook_first_idx, codebook_sizes, dense_matmul, stoch_grad):
    codebook_size = 2 ** codebook_bitwidth
    dim = coords.shape[-1]
    coords_axes = [coords[:, d] for d in range(dim)]
    hash_fn = (_lod_features_ckpt if coords.shape[0] > _HASH_REMAT_THRESHOLD
               else _lod_features)
    u0 = None
    if stoch_grad:
        # per-sample uniforms for the stochastic-corner backward, derived from the sample
        # position itself (shader-style sin hash) — samples are jittered every step, so
        # the draw is fresh per step without plumbing an rng key through the nef
        phase = coords_axes[0] * 12.9898 + coords_axes[1] * 78.233
        if dim == 3:
            phase = phase + coords_axes[2] * 37.719
        u0 = jnp.abs(jnp.sin(phase)) * 43758.5453
        u0 = u0 - jnp.floor(u0)
    feats = []
    for i in range(lod_idx + 1):
        res = int(resolutions[i])
        level = codebook[codebook_first_idx[i]:codebook_first_idx[i] + codebook_sizes[i]]
        if dense_matmul is not None and res ** dim <= codebook_size:
            feats.extend(_lod_features_dense_matmul_ckpt(
                coords_axes, res, level, dense_matmul,
                _fold_u(u0, i) if u0 is not None else None))
        elif u0 is not None:
            feats.extend(hash_fn(coords_axes, res, codebook_size, level,
                                 _fold_u(u0, i)))
        else:
            feats.extend(hash_fn(coords_axes, res, codebook_size, level))
    # [L*F, N] -> [N, L*F]: one transpose at the boundary to the decoder
    return jnp.stack(feats, axis=0).T


def hashgrid(coords: jax.Array,
             resolutions: Sequence[int],
             codebook_bitwidth: int,
             lod_idx: int,
             codebook: jax.Array,
             codebook_first_idx: Sequence[int],
             codebook_sizes: Sequence[int],
             dense_matmul: str = None,
             stoch_grad: bool = False) -> jax.Array:
    """Multi-LOD hash interpolation (reference ops/grid.py:128-144).

    Args:
        coords: [N, d] in [-1, 1].
        resolutions: static per-LOD grid resolutions.
        codebook: flat feature table [total_feats, F] (all LODs stacked).
        codebook_first_idx / codebook_sizes: static per-LOD offsets/sizes into the table.
        dense_matmul: None (always gather) or 'bf16'/'f32'/'f32_highest' — dense-table LODs
            (res^d <= 2^bitwidth) interpolate via one MXU matmul instead of 2^d gathers
            (see :func:`_lod_features_dense_matmul`; 3-4x faster fwd+bwd on TPU).
        stoch_grad: hash-gather LODs use the stochastic single-corner backward
            (:func:`interp_rows_stoch` — unbiased, 2^d-fold fewer backward scatter
            indices). Forward values are identical either way.

    Returns:
        [N, (lod_idx+1) * F]: per-LOD features concatenated (feature-dim fastest, matching
        the reference's packed output, hashgrid_interpolate_cuda.cu:78).
    """
    return _hashgrid_impl(coords, tuple(int(r) for r in resolutions),
                          int(codebook_bitwidth), int(lod_idx), codebook,
                          tuple(int(i) for i in codebook_first_idx),
                          tuple(int(s) for s in codebook_sizes),
                          dense_matmul, bool(stoch_grad))


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
        x = jnp.clip((coords + 1.0) / 2.0 * res, 0.0, res - 1 - 1e-5)
        c0 = jnp.floor(x).astype(jnp.int32)
        offsets = jnp.asarray(_corner_offsets(coords.shape[-1]))
        corners = c0[:, None, :] + offsets[None]
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
    """Straightforward [N, 2^d, F]-layout implementation, mirroring the reference's
    pure-torch reference impl (ops/grid.py:16-75). Kept as the independent correctness
    oracle for the layout-optimized ``hashgrid`` (tests/core/test_grid_ops.py)."""
    codebook_size = 2 ** codebook_bitwidth
    feats = []
    for i in range(lod_idx + 1):
        res = int(resolutions[i])
        x = jnp.clip((coords + 1.0) / 2.0 * res, 0.0, res - 1 - 1e-5)
        c0 = jnp.floor(x)
        frac = x - c0
        offsets = jnp.asarray(_corner_offsets(coords.shape[-1]))
        corners = c0[:, None, :].astype(jnp.int32) + offsets[None]
        idx = hash_index(corners, res, codebook_size)
        level = codebook[codebook_first_idx[i]:codebook_first_idx[i] + codebook_sizes[i]]
        fs = jnp.take(level, idx, axis=0)
        w = jnp.where(offsets[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
        weights = jnp.prod(w, axis=-1)
        feats.append(jnp.sum(fs * weights[..., None].astype(fs.dtype), axis=1))
    return jnp.concatenate(feats, axis=-1)
