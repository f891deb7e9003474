"""Probe: raw scatter-add cost at the hash-LOD backward's exact shapes.

Questions: (a) is scatter-add really ~36 ns/idx at [336k]->[524288,2] (vs 9 ns documented at
16.8M->512k)? (b) does ONE fused scatter over all LODs (global offset indices) beat 7
sequential per-LOD scatters? (c) does f32[2]-row width vs wider rows matter? (d) gather at
same shapes for comparison.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

ITERS = int(os.environ.get("P_ITERS", 10))
N = 41984
C = 8
L = 7
T = 524288

key = jax.random.PRNGKey(0)
idx_l = jax.random.randint(key, (L, C * N), 0, T)          # per-LOD indices
vals_l = jax.random.normal(key, (L, C * N, 2), jnp.float32)
offsets = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
idx_g = (idx_l + offsets).reshape(-1)                       # global fused indices
vals_g = vals_l.reshape(-1, 2)


def bench(name, fn, *args):
    f = jax.jit(fn)
    _ = float(f(*args)); _ = float(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = f(*args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    n_idx = L * C * N
    print(f"{name}: {dt*1e3:8.2f} ms  ({dt/n_idx*1e9:5.1f} ns/idx over {n_idx})", flush=True)
    return dt


def scatter_per_lod(idx_l, vals_l):
    acc = 0.0
    for i in range(L):
        tbl = jnp.zeros((T, 2), jnp.float32).at[idx_l[i]].add(vals_l[i])
        acc = acc + jnp.sum(tbl)
    return acc


def scatter_fused(idx_g, vals_g):
    tbl = jnp.zeros((L * T, 2), jnp.float32).at[idx_g].add(vals_g)
    return jnp.sum(tbl)


def gather_per_lod(idx_l, vals_l):
    tbl = vals_l[0][:T]
    acc = 0.0
    for i in range(L):
        acc = acc + jnp.sum(tbl[idx_l[i]])
    return acc


def scatter_1col(idx_g, vals_g):
    tbl = jnp.zeros((L * T,), jnp.float32).at[idx_g].add(vals_g[:, 0])
    return jnp.sum(tbl)


def scatter_sorted(idx_g, vals_g):
    # indices pre-sorted ascending — does locality help the scatter?
    return jnp.sum(jnp.zeros((L * T, 2), jnp.float32).at[jnp.sort(idx_g)].add(vals_g))


idx_sorted = jnp.sort(idx_g)
def scatter_presorted(idx_sorted, vals_g):
    return jnp.sum(jnp.zeros((L * T, 2), jnp.float32).at[idx_sorted].add(vals_g))


bench("scatter per-LOD (7x)   ", scatter_per_lod, idx_l, vals_l)
bench("scatter fused global   ", scatter_fused, idx_g, vals_g)
bench("scatter fused 1-col    ", scatter_1col, idx_g, vals_g)
bench("scatter presorted      ", scatter_presorted, idx_sorted, vals_g)
bench("gather per-LOD (7x)    ", gather_per_lod, idx_l, vals_l)
