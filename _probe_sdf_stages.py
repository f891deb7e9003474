"""Stage split of the FSD sphere tracer on TPU: walk loop vs sphere loop vs normals.
One chunk (65536 rays) of the sdf_render_bench workload."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.models.grids import OctreeGrid
from wisp_tpu.models.nefs.neural_sdf import NeuralSDF
from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
from wisp_tpu.ops.spc.core import quantize_points, quantize_points_jnp

v, f = make_sphere_mesh(radius=0.7, subdivisions=4)
samples = sample_surface(v, f, 1_000_000)
blas = OctreeAS.from_quantized_points(quantize_points(samples, 7), 7)
grid = OctreeGrid(blas=blas, feature_dim=16, num_lods=6, feature_std=0.01,
                  multiscale_type="sum", interpolation_type="linear",
                  key=jax.random.PRNGKey(0))
nef = NeuralSDF(grid=grid, pos_embedder="none", position_input=True,
                hidden_dim=128, num_layers=1, key=jax.random.PRNGKey(1))
fd = jax.jit(blas.free_space_distance)()

n = 65536
rng = np.random.default_rng(0)
xy = rng.uniform(-0.95, 0.95, (n, 2)).astype(np.float32)
origins = np.concatenate([xy, np.full((n, 1), -3.0, np.float32)], -1)
dirs = np.zeros_like(origins); dirs[:, 2] = 1.0
rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 10.0)

res = 128
voxel = 2.0 / res
STEPS = 32


def fsd_at(t, o, d):
    pos = o + t[:, None] * d
    inside = jnp.all((pos >= -1.0) & (pos < 1.0), axis=-1)
    q = quantize_points_jnp(pos, 7)
    flat = (q[..., 0] * res + q[..., 1]) * res + q[..., 2]
    return jnp.where(inside, fd[flat], jnp.int32(2 ** 30))


def free_step(k):
    return jnp.maximum(k.astype(jnp.float32) - 1.0, 0.5) * voxel


def walk_only(r):
    t_near, t_far = OctreeAS.aabb_intersect(r)
    t_near = jnp.maximum(t_near, 0.0) + 1e-6
    alive0 = t_far > t_near

    def body(i, carry):
        t, alive = carry
        k = fsd_at(t, r.origins, r.dirs)
        adv = alive & (k > 0)
        t = jnp.where(adv, t + free_step(k), t)
        return t, alive & (t <= t_far)

    t, alive = jax.lax.fori_loop(0, STEPS, body, (t_near, alive0))
    return t.sum(), alive.sum()


def sphere_only(r):
    """phase2-like loop: nef query + fsd gather per iter, starting at t_near."""
    t_near, t_far = OctreeAS.aabb_intersect(r)
    t = jnp.maximum(t_near, 0.0) + 1e-6
    alive = t_far > t

    def body(i, carry):
        t, alive, hit = carry
        d = nef(channels="sdf", coords=r.origins + t[:, None] * r.dirs)[:, 0]
        k = fsd_at(t, r.origins, r.dirs)
        in_occ = k == 0
        hit_now = alive & in_occ & (jnp.abs(d) < 3e-4)
        hit = hit | hit_now
        alive = alive & ~hit_now
        step = jnp.where(in_occ, jnp.maximum(d * 0.8, 0.0), free_step(k))
        t = jnp.where(alive, t + step, t)
        return t, alive & (t <= t_far), hit

    t, alive, hit = jax.lax.fori_loop(0, STEPS, body,
                                      (t, alive, jnp.zeros_like(alive)))
    return t.sum(), hit.sum()


def nef_once(r):
    d = nef(channels="sdf", coords=r.origins)
    return d.sum()


def timeit(fn, *a, iters=3):
    g = jax.jit(fn)
    out = g(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        out = g(*a)
        acc = acc + jax.tree_util.tree_leaves(out)[0]
    _ = float(acc)
    return (time.perf_counter() - t0) / iters


print("walk32    :", round(timeit(walk_only, rays) * 1e3, 1), "ms")
print("sphere32  :", round(timeit(sphere_only, rays) * 1e3, 1), "ms")
print("nef_once  :", round(timeit(nef_once, rays) * 1e3, 2), "ms")
