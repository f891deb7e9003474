"""Masked sample compaction — fixed-budget index extraction without scatters.

The TPU-shaped analog of the reference's packed-sample culling
(reference wisp/accelstructs/octree_as.py fast_filter_method, :21-34): valid samples of a
rectangular [R, S] mask gather into a static budget B. ``jnp.nonzero(size=B)`` does this but
lowers to cumsum + a full-[R*S] scatter (~10 ns per mask ELEMENT — 22 ms at [4096, 512] on
TPU v5e). This version finds the b-th set bit with a THREE-level search — per-row counts
locate the row, per-block counts locate a ``block``-wide span, the span's running count
locates the sample — using only row-gathers and compare-reduces (zero scatter indices;
5 ms at the training shape).

Why three levels: a two-level version gathered one FULL row of running counts per budget
slot, an [B, S] intermediate that is fine at training shapes but reached 137 GB at a
full-image render's [budget=2.1M, rays=16k] (OOM'd HBM). Blocking bounds every
intermediate to [B, max(R, S/block, block)] elements regardless of the mask shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_compact_indices(mask: jnp.ndarray, budget: int,
                           block: int = 128) -> jnp.ndarray:
    """Flat indices of the first ``budget`` True entries of a [R, S] mask, in row-major
    order; slots past the valid count are filled with R*S (one-past-the-end, for
    ``mode='drop'`` scatters downstream). Equivalent to
    ``jnp.nonzero(mask.reshape(-1), size=budget, fill_value=R*S)[0]``.
    """
    r, s = mask.shape
    rs = r * s
    m = mask.astype(jnp.int32)
    nb = -(-s // block)
    mp = jnp.pad(m, ((0, 0), (0, nb * block - s)))
    mb = mp.reshape(r, nb, block)
    in_blk_cum = jnp.cumsum(mb, axis=-1)                 # [R, nb, block] inclusive
    blk_cnt = in_blk_cum[..., -1]                        # [R, nb]
    blk_csum = jnp.cumsum(blk_cnt, axis=-1)              # [R, nb] inclusive within row
    row_cnt = blk_csum[:, -1]                            # [R]
    row_csum = jnp.cumsum(row_cnt)                       # [R] inclusive
    total = row_csum[-1]

    b = jnp.arange(budget, dtype=jnp.int32)
    # level 1 — row of the b-th valid sample: first row with row_csum > b (compare-reduce
    # beats jnp.searchsorted's while-loop of gathers on TPU: 5.2 vs 8.3 ms measured)
    row = jnp.sum(row_csum[None, :] <= b[:, None], axis=1).astype(jnp.int32)
    rowc = jnp.minimum(row, r - 1)
    o = b - (row_csum[rowc] - row_cnt[rowc])             # ordinal within the row

    # level 2 — block within the row
    bc_rows = jnp.take(blk_csum, rowc, axis=0)           # [B, nb] row gathers
    blk = jnp.sum(bc_rows <= o[:, None], axis=1).astype(jnp.int32)
    blkc = jnp.minimum(blk, nb - 1)
    blk_base = jnp.where(
        blkc > 0,
        jnp.take_along_axis(bc_rows, jnp.maximum(blkc - 1, 0)[:, None], axis=1)[:, 0],
        0)
    o2 = o - blk_base                                    # ordinal within the block

    # level 3 — position within the block
    cum_rows = jnp.take(in_blk_cum.reshape(r * nb, block),
                        rowc * nb + blkc, axis=0)        # [B, block] row gathers
    pos = jnp.sum(cum_rows <= o2[:, None], axis=1)       # first pos with cum > o2
    idx = rowc * s + blkc * block + jnp.minimum(pos, block - 1)
    return jnp.where(b < total, idx, rs)
