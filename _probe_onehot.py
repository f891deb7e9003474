"""Probe: one-hot MXU table lookup vs XLA row-gather, fwd and fwd+bwd, per table size.

The hot cost is per gather/scatter INDEX (~10ns). For a dense-table LOD the trilinear
interp is a linear map out = W @ T with W [N, S_l] having 8 weights per row; if building W
by compare-with-iota and doing two matmuls (fwd W@T, bwd W^T@g) beats 8 gathers + 8
scatters, small LODs leave the index budget entirely.
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

N = int(os.environ.get("PROBE_N", 131072))
F = 2
ITERS = 10

def sync(x):
    return float(jnp.sum(x))

def timeit(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    sync(out if isinstance(out, jax.Array) else out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    s = sync(out if isinstance(out, jax.Array) else out[0])
    return (time.perf_counter() - t0) / ITERS, s

key = jax.random.PRNGKey(0)

for S in [4096, 8192, 16384, 32768, 65536]:
    tbl = jax.random.normal(key, (S, F), jnp.float32)
    idx = jax.random.randint(key, (8, N), 0, S)            # 8 corners
    w = jax.random.uniform(key, (8, N), jnp.float32)
    g = jax.random.normal(key, (N, F), jnp.float32)        # upstream cotangent

    # ---- gather path: fwd = sum_c w_c * T[idx_c]; bwd wrt T = scatter-add
    def gather_fwd(tbl):
        rows = tbl[idx.reshape(-1)].reshape(8, N, F)
        return jnp.sum(rows * w[..., None], axis=0)

    def gather_fwd_bwd(tbl):
        out, vjp = jax.vjp(gather_fwd, tbl)
        (dt,) = vjp(g)
        return out, dt

    t_f, _ = timeit(gather_fwd, tbl)
    t_fb, _ = timeit(gather_fwd_bwd, tbl)

    # ---- one-hot path (f32 accum, bf16 operands)
    iota = jnp.arange(S, dtype=jnp.int32)
    def onehot_fwd(tbl):
        # W[n, j] = sum_c w_c[n] * (idx_c[n] == j)   -> [N, S]
        W = jnp.sum(jnp.where(idx[:, :, None] == iota[None, None, :],
                              w[:, :, None], 0.0), axis=0)
        return jax.lax.dot_general(W.astype(jnp.bfloat16), tbl.astype(jnp.bfloat16),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def onehot_fwd_bwd(tbl):
        out, vjp = jax.vjp(onehot_fwd, tbl)
        (dt,) = vjp(g)
        return out, dt

    try:
        t_of, _ = timeit(onehot_fwd, tbl)
        t_ofb, _ = timeit(onehot_fwd_bwd, tbl)
    except Exception as e:
        t_of = t_ofb = float("nan")
        print("onehot failed at S=", S, repr(e)[:120])

    print(f"S={S:6d}  gather fwd {t_f*1e3:8.2f} ms  fwd+bwd {t_fb*1e3:8.2f} ms   "
          f"onehot fwd {t_of*1e3:8.2f} ms  fwd+bwd {t_ofb*1e3:8.2f} ms", flush=True)
