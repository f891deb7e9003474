"""Masked sample compaction — fixed-budget index extraction without scatters.

The TPU-shaped analog of the reference's packed-sample culling
(reference wisp/accelstructs/octree_as.py fast_filter_method, :21-34): valid samples of a
rectangular [R, S] mask gather into a static budget B. ``jnp.nonzero(size=B)`` does this but
lowers to cumsum + a full-[R*S] scatter (~22 ms at [4096, 512] on TPU v5e, the same ~10 ns
per ELEMENT every scatter pays). This version finds the b-th set bit with a two-level
search — per-ray counts locate the ray, the ray's running count locates the sample — using
only row-gathers and compare-reduces (measured 5.2 ms, 4.3x faster; zero scatter indices).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_compact_indices(mask: jnp.ndarray, budget: int) -> jnp.ndarray:
    """Flat indices of the first ``budget`` True entries of a [R, S] mask, in row-major
    order; slots past the valid count are filled with R*S (one-past-the-end, for
    ``mode='drop'`` scatters downstream). Equivalent to
    ``jnp.nonzero(mask.reshape(-1), size=budget, fill_value=R*S)[0]``.
    """
    r, s = mask.shape
    rs = r * s
    m = mask.astype(jnp.int32)
    row_cnt = jnp.sum(m, axis=1)                        # [R]
    csum = jnp.cumsum(row_cnt)                          # [R] inclusive
    total = csum[-1]
    b = jnp.arange(budget, dtype=jnp.int32)
    # ray of the b-th valid sample: first r with csum[r] > b (compare-reduce beats
    # jnp.searchsorted's while-loop of gathers on TPU: 5.2 vs 8.3 ms measured)
    ray = jnp.sum(csum[None, :] <= b[:, None], axis=1).astype(jnp.int32)   # [B]
    rayc = jnp.minimum(ray, r - 1)
    base = csum[rayc] - row_cnt[rayc]                   # valid ordinal at ray start
    o = b - base                                        # within-ray ordinal
    rowcum = jnp.cumsum(m, axis=1)                      # [R, S] inclusive
    rows = jnp.take(rowcum, rayc, axis=0)               # [B, S] row gathers
    s_pos = jnp.sum(rows <= o[:, None], axis=1)         # first s with rowcum > o
    idx = rayc * s + jnp.minimum(s_pos, s - 1)
    return jnp.where(b < total, idx, rs)
