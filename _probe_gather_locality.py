"""Probe: is XLA's 1-D gather cost sensitive to index locality?

The march gathers occupancy/density for consecutive samples along rays. In row-major cell
layout those indices jump by +-res^2 between steps; in Morton layout they'd be near-adjacent.
If locality helps, re-indexing the density field is nearly free. Cases at 2.1M indices from
a [2 ^ 21] f32 table:
  random        — uniform random (current worst case)
  sorted        — same values sorted (max locality, monotone)
  ray-coherent  — 4096 'rays' x 512 'steps': base random, step stride 1 (neighboring)
  strided       — base random, stride res^2=16384 (row-major z-step, current layout)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

ITERS = 10
T = 2 ** 21
R, S = 4096, 512
N = R * S

rng = np.random.default_rng(0)
idx_random = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
idx_sorted = jnp.sort(idx_random)
base = rng.integers(0, T - S, R).astype(np.int32)
idx_coherent = jnp.asarray((base[:, None] + np.arange(S, dtype=np.int32)[None, :])
                           .reshape(-1))
base2 = rng.integers(0, T, R).astype(np.int64)
idx_strided = jnp.asarray(((base2[:, None] + np.arange(S, dtype=np.int64)[None, :] * 16384)
                           % T).astype(np.int32).reshape(-1))
tbl = jnp.asarray(rng.normal(size=(T,)).astype(np.float32))


def bench(name, idx):
    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    _ = float(f(tbl, idx)); _ = float(f(tbl, idx))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = f(tbl, idx)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms  ({dt/N*1e9:5.2f} ns/idx)", flush=True)


bench("random      ", idx_random)
bench("sorted      ", idx_sorted)
bench("ray-coherent", idx_coherent)
bench("strided 16k ", idx_strided)
