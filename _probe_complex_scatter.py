"""Probe: can complex64 scatter-add halve the backward's per-index cost for F=2?

A hash-LOD backward scatters two f32 feature columns per index (2 x 8.1 ns/idx).
complex64 addition is elementwise over (re, im), so one complex64 rank-1 scatter-add
could carry both columns on a single index stream. Measure vs the two-column f32 path.
Also probe gather of complex64 rows for symmetry.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

ITERS = int(os.environ.get("P_ITERS", 10))
N = 2351104
T = 524288

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, T)
vals = jax.random.normal(key, (N, 2), jnp.float32)
cvals = jax.lax.complex(vals[:, 0], vals[:, 1])


def bench(name, fn, *args):
    f = jax.jit(fn)
    _ = float(f(*args)); _ = float(f(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = f(*args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms  ({dt/N*1e9:5.1f} ns/idx)", flush=True)
    return dt


def two_f32_cols(idx, vals):
    a = jnp.zeros((T,), jnp.float32).at[idx].add(vals[:, 0])
    b = jnp.zeros((T,), jnp.float32).at[idx].add(vals[:, 1])
    return jnp.sum(a) + jnp.sum(b)


def one_c64(idx, cvals):
    t = jnp.zeros((T,), jnp.complex64).at[idx].add(cvals)
    return jnp.sum(jnp.real(t)) + jnp.sum(jnp.imag(t))


def gather_c64(idx, cvals):
    tbl = cvals[:T]
    g = tbl[idx]
    return jnp.sum(jnp.real(g))


def gather_f32_rows(idx, vals):
    tbl = vals[:T]
    g = tbl[idx]
    return jnp.sum(g)


# correctness
a = jax.jit(two_f32_cols)(idx, vals)
b = jax.jit(one_c64)(idx, cvals)
print(f"sums match: {abs(float(a) - float(b)) < 1e-1} ({float(a):.3f} vs {float(b):.3f})",
      flush=True)

bench("two f32 col scatters ", two_f32_cols, idx, vals)
bench("one c64 scatter      ", one_c64, idx, cvals)
bench("f32 row gather [T,2] ", gather_f32_rows, idx, vals)
bench("c64 gather [T]       ", gather_c64, idx, cvals)
