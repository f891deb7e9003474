"""Probe: factored MXU trilinear interpolation vs XLA row-gather for DENSE-table LODs.

For a dense LOD (res^3 rows, row-major), trilinear interp = a linear map with factorable
weights: out[n,f] = sum_xyz Wx[n,x] Wy[n,y] Wz[n,z] G[x,y,z,f]. Build Wxy = Wx (x) Wy in one
bandwidth-optimal pass, do ONE matmul [N, XY] @ [XY, ZF], then a per-sample z-reduction.
Backward wrt G is the transposed matmul — zero gather/scatter indices.

Compare per res in {16, 32, 64, 80}: gather path (8 idx fwd + 8 scatter bwd per sample)
vs matmul path (bf16 and f32), fwd and fwd+bwd, N=131072, F=2.
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

N = int(os.environ.get("PROBE_N", 131072))
F = 2
ITERS = int(os.environ.get("PROBE_ITERS", 10))

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
print(f"device={jax.devices()[0]} N={N} F={F} iters={ITERS}", flush=True)

for res in [16, 32, 64, 80]:
    S = res ** 3
    kg, kc = jax.random.split(jax.random.fold_in(key, res))
    tbl = jax.random.normal(kg, (S, F), jnp.float32)
    coords = jax.random.uniform(kc, (N, 3), jnp.float32, -1.0, 1.0)
    g = jax.random.normal(kg, (N, F), jnp.float32)  # upstream cotangent

    def prep(coords):
        x = jnp.clip((coords + 1.0) * (res / 2.0), 0.0, res - 1 - 1e-5)
        c0 = jnp.floor(x).astype(jnp.int32)
        frac = x - jnp.floor(x)
        return c0, frac

    # ---- gather path (current production): 8 row-gathers fwd, 8 scatter-adds bwd
    def gather_fwd(tbl, coords):
        c0, frac = prep(coords)
        offs = np.array([[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.int32)
        acc = 0.0
        for c in range(8):
            cc = c0 + offs[c]
            idx = (cc[:, 0] * res + cc[:, 1]) * res + cc[:, 2]
            w = jnp.prod(jnp.where(offs[c].astype(bool), frac, 1.0 - frac), axis=-1)
            acc = acc + tbl[idx] * w[:, None]
        return acc

    # ---- factored matmul path
    def axis_w(c, f, width, dtype):
        io = jnp.arange(width, dtype=jnp.int32)[None, :]
        lo = (io == c[:, None]).astype(dtype) * (1.0 - f[:, None]).astype(dtype)
        hi = (io == (c[:, None] + 1)).astype(dtype) * f[:, None].astype(dtype)
        return lo + hi  # [N, width], 2 nonzeros

    def matmul_fwd(tbl, coords, dtype):
        c0, frac = prep(coords)
        wx = axis_w(c0[:, 0], frac[:, 0], res, dtype)
        wy = axis_w(c0[:, 1], frac[:, 1], res, dtype)
        wz = axis_w(c0[:, 2], frac[:, 2], res, dtype)
        wxy = (wx[:, :, None] * wy[:, None, :]).reshape(N, res * res)
        out1 = jax.lax.dot_general(wxy, tbl.astype(dtype).reshape(res * res, res * F),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out1 = out1.reshape(N, res, F)
        return jnp.sum(out1 * wz.astype(jnp.float32)[:, :, None], axis=1)

    def bwd_of(fwd):
        def fb(tbl, coords):
            out, vjp = jax.vjp(lambda t: fwd(t, coords), tbl)
            (dt,) = vjp(g)
            return out, dt
        return fb

    t_gf, _ = timeit(gather_fwd, tbl, coords)
    t_gfb, _ = timeit(bwd_of(gather_fwd), tbl, coords)
    mm16 = lambda t, c: matmul_fwd(t, c, jnp.bfloat16)
    mm32 = lambda t, c: matmul_fwd(t, c, jnp.float32)
    t_m16, s16 = timeit(mm16, tbl, coords)
    t_m16b, _ = timeit(bwd_of(mm16), tbl, coords)
    t_m32, s32 = timeit(mm32, tbl, coords)
    t_m32b, _ = timeit(bwd_of(mm32), tbl, coords)
    # correctness
    ref = np.asarray(jax.jit(gather_fwd)(tbl, coords))
    err16 = float(np.abs(np.asarray(jax.jit(mm16)(tbl, coords)) - ref).max())
    err32 = float(np.abs(np.asarray(jax.jit(mm32)(tbl, coords)) - ref).max())
    print(f"res={res:3d} S={S:7d} | gather fwd {t_gf*1e3:7.2f}ms fwd+bwd {t_gfb*1e3:7.2f}ms"
          f" | mm_bf16 fwd {t_m16*1e3:7.2f}ms fwd+bwd {t_m16b*1e3:7.2f}ms err {err16:.2e}"
          f" | mm_f32 fwd {t_m32*1e3:7.2f}ms fwd+bwd {t_m32b*1e3:7.2f}ms err {err32:.2e}",
          flush=True)

print("--- f32 precision=HIGHEST variant ---", flush=True)
for res in [16, 32, 64, 80]:
    S = res ** 3
    kg, kc = jax.random.split(jax.random.fold_in(key, res))
    tbl = jax.random.normal(kg, (S, F), jnp.float32)
    coords = jax.random.uniform(kc, (N, 3), jnp.float32, -1.0, 1.0)
    g = jax.random.normal(kg, (N, F), jnp.float32)

    def prep(coords):
        x = jnp.clip((coords + 1.0) * (res / 2.0), 0.0, res - 1 - 1e-5)
        c0 = jnp.floor(x).astype(jnp.int32)
        return c0, x - jnp.floor(x)

    def gather_fwd(tbl, coords):
        c0, frac = prep(coords)
        offs = np.array([[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.int32)
        acc = 0.0
        for c in range(8):
            cc = c0 + offs[c]
            idx = (cc[:, 0] * res + cc[:, 1]) * res + cc[:, 2]
            w = jnp.prod(jnp.where(offs[c].astype(bool), frac, 1.0 - frac), axis=-1)
            acc = acc + tbl[idx] * w[:, None]
        return acc

    def axis_w(c, f, width):
        io = jnp.arange(width, dtype=jnp.int32)[None, :]
        return ((io == c[:, None]) * (1.0 - f[:, None])
                + (io == (c[:, None] + 1)) * f[:, None]).astype(jnp.float32)

    def mm_hi(tbl, coords):
        c0, frac = prep(coords)
        wx = axis_w(c0[:, 0], frac[:, 0], res)
        wy = axis_w(c0[:, 1], frac[:, 1], res)
        wz = axis_w(c0[:, 2], frac[:, 2], res)
        wxy = (wx[:, :, None] * wy[:, None, :]).reshape(N, res * res)
        out1 = jax.lax.dot_general(wxy, tbl.reshape(res * res, res * F),
                                   (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        return jnp.sum(out1.reshape(N, res, F) * wz[:, :, None], axis=1)

    def fb(tbl, coords):
        out, vjp = jax.vjp(lambda t: mm_hi(t, coords), tbl)
        (dt,) = vjp(g)
        return out, dt

    t_f, _ = timeit(mm_hi, tbl, coords)
    t_fb, _ = timeit(fb, tbl, coords)
    ref = np.asarray(jax.jit(gather_fwd)(tbl, coords))
    err = float(np.abs(np.asarray(jax.jit(mm_hi)(tbl, coords)) - ref).max())
    print(f"res={res:3d} | mm_f32hi fwd {t_f*1e3:7.2f}ms fwd+bwd {t_fb*1e3:7.2f}ms err {err:.2e}", flush=True)
