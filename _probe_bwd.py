"""Probe: what composes the 78.7 ms backward of the flagship step?

Isolated pieces at bench config (budget=41984 compacted samples, 13 kept LODs of 16,
8 dense-matmul + 5 hash):
  1 interp fwd only                                 (expect ~12.7 ms)
  2 interp fwd+bwd WITH jax.checkpoint (production)
  3 interp fwd+bwd WITHOUT checkpoint
  4 march+compact fwd+bwd via full-graph grad of a scalar (measures integrate bwd + DCE)
Sync rule: fetch a scalar.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from functools import partial

from wisp_tpu.ops import grid as gridops

N = int(os.environ.get("P_N", 41984))
ITERS = int(os.environ.get("P_ITERS", 10))
BW = 19
RESOLUTIONS = []
b, base, mx = 1.3819129, 16, 512  # matches HashGrid.from_geometric(16->512, 16 lods)
for i in range(16):
    RESOLUTIONS.append(int(np.floor(base * (b ** i))))
KEEP = 13  # max_compute_lod=12

codebook_size = 2 ** BW
sizes = [min(r ** 3, codebook_size) for r in RESOLUTIONS]
first = list(np.cumsum([0] + sizes[:-1]))
total = sum(sizes)
key = jax.random.PRNGKey(0)
codebook = jax.random.normal(key, (total, 2), jnp.float32) * 0.01
coords = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), jnp.float32, -1.0, 1.0)

res_kept = RESOLUTIONS[:KEEP]
print(f"N={N} lods kept={KEEP} resolutions={res_kept} "
      f"dense={[r for r in res_kept if r**3 <= codebook_size]}", flush=True)


def interp(codebook, coords):
    return gridops.hashgrid(coords, RESOLUTIONS, BW, KEEP - 1, codebook, first, sizes,
                            dense_matmul="bf16")


def interp_nockpt(codebook, coords):
    # same body as _hashgrid_impl but without jax.checkpoint
    coords_axes = [coords[:, d] for d in range(3)]
    feats = []
    for i in range(KEEP):
        res = int(RESOLUTIONS[i])
        level = codebook[first[i]:first[i] + sizes[i]]
        if res ** 3 <= codebook_size:
            feats.extend(gridops._lod_features_dense_matmul(coords_axes, res, level, "bf16"))
        else:
            feats.extend(gridops._lod_features(coords_axes, res, codebook_size, level))
    return jnp.stack(feats, axis=0).T


def bench(name, fn, *args):
    f = jax.jit(fn)
    _ = float(f(*args)); _ = float(f(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(ITERS):
        acc = f(*args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms", flush=True)
    return dt


t1 = bench("1 interp fwd           ", lambda cb, c: jnp.sum(interp(cb, c)), codebook, coords)
t2 = bench("2 interp f+b ckpt      ",
           lambda cb, c: jnp.sum(jax.grad(lambda cb_: jnp.sum(interp(cb_, c)))(cb)),
           codebook, coords)
t3 = bench("3 interp f+b nockpt    ",
           lambda cb, c: jnp.sum(jax.grad(lambda cb_: jnp.sum(interp_nockpt(cb_, c)))(cb)),
           codebook, coords)

# 4: hash LODs only (gather path) f+b, to separate dense-matmul bwd from scatter-add bwd
def interp_hash_only(codebook, coords):
    coords_axes = [coords[:, d] for d in range(3)]
    feats = []
    for i in range(KEEP):
        res = int(RESOLUTIONS[i])
        if res ** 3 <= codebook_size:
            continue
        level = codebook[first[i]:first[i] + sizes[i]]
        feats.extend(gridops._lod_features(coords_axes, res, codebook_size, level))
    return jnp.stack(feats, axis=0).T

def interp_dense_only(codebook, coords):
    coords_axes = [coords[:, d] for d in range(3)]
    feats = []
    for i in range(KEEP):
        res = int(RESOLUTIONS[i])
        if res ** 3 > codebook_size:
            continue
        level = codebook[first[i]:first[i] + sizes[i]]
        feats.extend(gridops._lod_features_dense_matmul(coords_axes, res, level, "bf16"))
    return jnp.stack(feats, axis=0).T

t4 = bench("4 hash-only f+b nockpt ",
           lambda cb, c: jnp.sum(jax.grad(lambda cb_: jnp.sum(interp_hash_only(cb_, c)))(cb)),
           codebook, coords)
t5 = bench("5 dense-only f+b nockpt",
           lambda cb, c: jnp.sum(jax.grad(lambda cb_: jnp.sum(interp_dense_only(cb_, c)))(cb)),
           codebook, coords)
print(f"\nckpt overhead={(t2-t3)*1e3:.1f} ms; hash f+b={t4*1e3:.1f} dense f+b={t5*1e3:.1f}",
      flush=True)
