"""Probe: gather-based masked compaction vs jnp.nonzero(size=B).

Current production: (idx,) = jnp.nonzero(mask_flat, size=B, fill_value=RS) — internally a
cumsum + full-size scatter (~17.6 ms measured at [4096x512] -> 41984).

Candidate (zero scatters): hierarchical two-level search.
  row_cnt[r] = sum(mask[r]); csum = cumsum(row_cnt)
  ray_of_slot[b] = searchsorted(csum, b, 'right')            (b in [0, B))
  o[b] = b - (csum - row_cnt)[ray_of_slot[b]]
  rowcum = cumsum(mask, axis=1)  (inclusive)
  s_of_slot[b] = # of entries in rowcum[ray] <= o[b]  == first position with rowcum > o
  idx[b] = ray*S + s_of_slot, fill RS where b >= total
Both searches implemented two ways: jnp.searchsorted and compare-reduce.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

R, S = 4096, 512
B = 41984
ITERS = 10
RS = R * S

rng = np.random.default_rng(0)
mask_np = rng.random((R, S)) < 0.018
mask = jnp.asarray(mask_np)


def nonzero_ref(mask):
    (idx,) = jnp.nonzero(mask.reshape(-1), size=B, fill_value=RS)
    return idx


def compact_searchsorted(mask):
    m = mask.astype(jnp.int32)
    row_cnt = jnp.sum(m, axis=1)                      # [R]
    csum = jnp.cumsum(row_cnt)                        # [R] inclusive
    total = csum[-1]
    b = jnp.arange(B, dtype=jnp.int32)
    ray = jnp.searchsorted(csum, b, side="right").astype(jnp.int32)
    rayc = jnp.minimum(ray, R - 1)
    base = csum[rayc] - row_cnt[rayc]
    o = b - base                                      # within-ray ordinal
    rowcum = jnp.cumsum(m, axis=1)                    # [R, S] inclusive
    rows = jnp.take(rowcum, rayc, axis=0)             # [B, S]
    s_pos = jnp.sum(rows <= o[:, None], axis=1)       # first pos with rowcum > o
    idx = rayc * S + jnp.minimum(s_pos, S - 1)
    return jnp.where(b < total, idx, RS)


def compact_comparesum(mask):
    m = mask.astype(jnp.int32)
    row_cnt = jnp.sum(m, axis=1)
    csum = jnp.cumsum(row_cnt)
    total = csum[-1]
    b = jnp.arange(B, dtype=jnp.int32)
    ray = jnp.sum(csum[None, :] <= b[:, None], axis=1).astype(jnp.int32)  # [B]
    rayc = jnp.minimum(ray, R - 1)
    base = csum[rayc] - row_cnt[rayc]
    o = b - base
    rowcum = jnp.cumsum(m, axis=1)
    rows = jnp.take(rowcum, rayc, axis=0)
    s_pos = jnp.sum(rows <= o[:, None], axis=1)
    idx = rayc * S + jnp.minimum(s_pos, S - 1)
    return jnp.where(b < total, idx, RS)


# correctness vs nonzero on host
ref = np.flatnonzero(mask_np.reshape(-1))
out1 = np.asarray(jax.jit(compact_searchsorted)(mask))
out2 = np.asarray(jax.jit(compact_comparesum)(mask))
k = min(len(ref), B)
assert np.array_equal(out1[:k], ref[:k]), "searchsorted variant mismatch"
assert np.array_equal(out2[:k], ref[:k]), "comparesum variant mismatch"
assert np.all(out1[k:] == RS) and np.all(out2[k:] == RS)
print(f"correct (total valid={len(ref)}, budget={B})", flush=True)


def bench(name, fn, *args):
    f = jax.jit(fn)
    _ = float(jnp.sum(f(*args)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = f(*args)
    _ = float(jnp.sum(acc))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms", flush=True)
    return dt


bench("nonzero(size=B)     ", nonzero_ref, mask)
bench("compact searchsorted", compact_searchsorted, mask)
bench("compact comparesum  ", compact_comparesum, mask)
