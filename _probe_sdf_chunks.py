"""Is the FSD walk loop overhead-bound? Time a 32-iter fori_loop of the walk body at
chunk sizes 65k/131k/262k, plus a pure-gather loop (no quantize/elementwise) as floor."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
from wisp_tpu.ops.spc.core import quantize_points, quantize_points_jnp

v, f = make_sphere_mesh(radius=0.7, subdivisions=4)
samples = sample_surface(v, f, 1_000_000)
blas = OctreeAS.from_quantized_points(quantize_points(samples, 7), 7)
fd = jax.jit(blas.free_space_distance)()

res = 128
voxel = 2.0 / res
STEPS = 32


def make_rays(n):
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.95, 0.95, (n, 2)).astype(np.float32)
    origins = np.concatenate([xy, np.full((n, 1), -3.0, np.float32)], -1)
    dirs = np.zeros_like(origins); dirs[:, 2] = 1.0
    return Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 10.0)


def walk_only(r):
    t_near, t_far = OctreeAS.aabb_intersect(r)
    t_near = jnp.maximum(t_near, 0.0) + 1e-6
    alive0 = t_far > t_near

    def body(i, carry):
        t, alive = carry
        pos = r.origins + t[:, None] * r.dirs
        inside = jnp.all((pos >= -1.0) & (pos < 1.0), axis=-1)
        q = quantize_points_jnp(pos, 7)
        flat = (q[..., 0] * res + q[..., 1]) * res + q[..., 2]
        k = jnp.where(inside, fd[flat], jnp.int32(2 ** 30))
        adv = alive & (k > 0)
        t = jnp.where(adv, t + jnp.maximum(k.astype(jnp.float32) - 1.0, 0.5) * voxel, t)
        return t, alive & (t <= t_far)

    t, alive = jax.lax.fori_loop(0, STEPS, body, (t_near, alive0))
    return t.sum()


def gather_loop(idx):
    def body(i, acc):
        return acc + fd[(idx + i) % fd.shape[0]].sum()
    return jax.lax.fori_loop(0, STEPS, body, jnp.int32(0))


def timeit(fn, *a, iters=5):
    g = jax.jit(fn)
    _ = float(jax.tree_util.tree_leaves(g(*a))[0])
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc = acc + jax.tree_util.tree_leaves(g(*a))[0]
    _ = float(acc)
    return (time.perf_counter() - t0) / iters


for n in (262144, 131072, 65536, 131072, 65536):
    r = make_rays(n)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, fd.shape[0], n, np.int32))
    print(f"n={n:7d}  walk32 {timeit(walk_only, r)*1e3:7.1f} ms"
          f"   gather32 {timeit(gather_loop, idx)*1e3:7.1f} ms")
