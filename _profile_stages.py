"""Stage-level TPU profile of the flagship bench step (4096 rays x 512 steps).

Measures cumulative jitted stages so differences attribute time:
  A raymarch only (occupancy gather + mask + sample gen over [R,S])
  B + early-stop transmittance estimate + compaction nonzero/gather
  C + grid interpolate (dense-matmul LODs + hash LODs) fwd
  D + decode (MLP) fwd
  E + integrate -> loss fwd
  F full fwd+bwd+optimizer (the bench step)
Sync rule: fetch a scalar (remote platform ignores block_until_ready).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers import PackedRFTracer

R = int(os.environ.get("P_RAYS", 4096)); S = int(os.environ.get("P_STEPS", 512))
ITERS = int(os.environ.get("P_ITERS", 10))
COMPACTION = float(os.environ.get("P_COMPACTION", 0.02))
EARLY = float(os.environ.get("P_EARLY", 0.01))
LODSCALE = float(os.environ.get("P_LODSCALE", 1.0))
DENSE = os.environ.get("P_DENSE", "bf16") or None
if DENSE in ("none", "0", ""):
    DENSE = None

from wisp_tpu.datasets.random_view_dataset import scene_density_color
rng0 = np.random.default_rng(3)
pts = rng0.uniform(-1.0, 1.0, (400000, 3)).astype(np.float32)
dens, _ = scene_density_color(jnp.asarray(pts))
pc = pts[np.asarray(dens[:, 0]) > 1.0]
blas = OctreeAS.from_pointcloud(pc, 7, dilate=1)
res = 2 ** blas.max_level
cells = np.asarray(blas.points[blas.max_level], np.float32)
centers = (cells + 0.5) / res * 2.0 - 1.0
cell_dens, _ = scene_density_color(jnp.asarray(centers))
flat = ((cells[:, 0].astype(np.int64) * res + cells[:, 1]) * res + cells[:, 2]).astype(np.int64)
field = jnp.full((res ** 3,), -1.0, jnp.float32).at[flat].set(cell_dens[:, 0])
blas = blas.update_occupancy(blas.occ_grid, cell_density=field)

grid = HashGrid.from_geometric(blas=blas, feature_dim=2, num_lods=16,
                               multiscale_type="cat", feature_std=1e-9,
                               codebook_bitwidth=19, min_grid_res=16, max_grid_res=512,
                               dense_lod_matmul=DENSE, key=jax.random.PRNGKey(1))
nef = NeuralRadianceField(grid=grid, view_embedder="positional", view_multires=4,
                          hidden_dim=64, num_layers=1, bias=True, key=jax.random.PRNGKey(2))
tracer = PackedRFTracer(raymarch_type="ray", num_steps=S, bg_color=(0., 0., 0.),
                        compaction=COMPACTION, early_stop=EARLY, lod_spacing_scale=LODSCALE)
pipeline = Pipeline(nef=nef, tracer=tracer)

rng = np.random.default_rng(0)
eye = np.asarray([0.0, 0.0, -3.0], np.float32)
dirs = rng.normal(size=(R, 3)).astype(np.float32)
dirs[:, 2] = np.abs(dirs[:, 2]) + 2.0
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
rays = Rays(jnp.asarray(np.broadcast_to(eye, (R, 3)).copy()), jnp.asarray(dirs), 0.0, 6.0)
gts = jnp.asarray(rng.random((R, 3)).astype(np.float32))

n = R
budget = int(np.ceil(n * S * COMPACTION / 128.0)) * 128
lod_idx = grid.num_lods - 1
delta_est = 2.0 * float(np.sqrt(3)) / S
res_cap = 2.0 / (LODSCALE * delta_est) if LODSCALE > 0 else 1e9
keep = [i for i, r_ in enumerate(grid.resolutions) if r_ <= res_cap]
max_compute_lod = max(keep) if keep else 0
print(f"budget={budget} max_compute_lod={max_compute_lod} of {grid.num_lods}", flush=True)

key = jax.random.PRNGKey(7)

def stage_A(grid, rays, key):
    mr = grid.raymarch(rays, raymarch_type="ray", num_samples=S, level=None, key=key)
    return jnp.sum(mr.samples) + jnp.sum(mr.mask) + jnp.sum(mr.depth_samples)

def _march_compact(grid, rays, key):
    mr = grid.raymarch(rays, raymarch_type="ray", num_samples=S, level=None, key=key)
    deltas = jnp.broadcast_to(mr.deltas, mr.depth_samples.shape)
    mask = mr.mask
    tau_hat = mr.cell_density * deltas * mask.astype(jnp.float32)
    t_hat = jnp.exp(-(jnp.cumsum(tau_hat, axis=-1) - tau_hat))
    mask = mask & (t_hat > EARLY)
    flatc = mr.samples.reshape(n * S, 3)
    ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (n, S, 3)).reshape(n * S, 3)
    flat_mask = mask.reshape(n * S)
    (idx,) = jnp.nonzero(flat_mask, size=budget, fill_value=n * S)
    cflat = jnp.take(flatc, jnp.minimum(idx, n * S - 1), axis=0)
    cray_d = jnp.take(ray_d, jnp.minimum(idx, n * S - 1), axis=0)
    return mr, mask, deltas, idx, cflat, cray_d

def stage_B(grid, rays, key):
    mr, mask, deltas, idx, cflat, cray_d = _march_compact(grid, rays, key)
    return jnp.sum(cflat) + jnp.sum(idx) + jnp.sum(cray_d)

def stage_C(grid, rays, key):
    mr, mask, deltas, idx, cflat, cray_d = _march_compact(grid, rays, key)
    feats = grid.interpolate(cflat, lod_idx, max_compute_lod=max_compute_lod)
    return jnp.sum(feats)

def stage_D(nef, rays, key):
    g = nef.grid
    mr, mask, deltas, idx, cflat, cray_d = _march_compact(g, rays, key)
    out = nef(channels=["rgb", "density"], coords=cflat, ray_d=cray_d,
              lod_idx=lod_idx, max_compute_lod=max_compute_lod)
    return jnp.sum(out["rgb"]) + jnp.sum(out["density"])

def stage_E(pipeline, rays, key):
    rb = pipeline(rays=rays, channels=["rgb"], key=key)
    diff = rb.rgb - gts
    return jnp.mean(jnp.where(jnp.abs(diff) < 0.1, 0.5 * diff * diff / 0.1,
                              jnp.abs(diff) - 0.05))

def stage_F(pipeline, rays, key):
    def loss_fn(p):
        rb = p(rays=rays, channels=["rgb"], key=key)
        diff = rb.rgb - gts
        return jnp.mean(jnp.where(jnp.abs(diff) < 0.1, 0.5 * diff * diff / 0.1,
                                  jnp.abs(diff) - 0.05))
    l, g = jax.value_and_grad(loss_fn, allow_int=True)(pipeline)
    leaves = jax.tree_util.tree_leaves(g)
    return l + sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves
                   if jnp.issubdtype(x.dtype, jnp.floating))

def bench(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    _ = float(f(*args))
    compile_s = time.perf_counter() - t0
    _ = float(f(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(ITERS):
        acc = f(*args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms  (compile {compile_s:.1f}s)", flush=True)
    return dt

def stage_B1(grid, rays, key):
    """march + early-stop transmittance estimate, NO nonzero/compaction."""
    mr = grid.raymarch(rays, raymarch_type="ray", num_samples=S, level=None, key=key)
    deltas = jnp.broadcast_to(mr.deltas, mr.depth_samples.shape)
    mask = mr.mask
    tau_hat = mr.cell_density * deltas * mask.astype(jnp.float32)
    t_hat = jnp.exp(-(jnp.cumsum(tau_hat, axis=-1) - tau_hat))
    mask = mask & (t_hat > EARLY)
    return jnp.sum(mask) + jnp.sum(mr.samples)

def stage_B2(grid, rays, key):
    """march + nonzero/compaction, NO early-stop estimate."""
    mr = grid.raymarch(rays, raymarch_type="ray", num_samples=S, level=None, key=key)
    flatc = mr.samples.reshape(n * S, 3)
    ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (n, S, 3)).reshape(n * S, 3)
    flat_mask = mr.mask.reshape(n * S)
    (idx,) = jnp.nonzero(flat_mask, size=budget, fill_value=n * S)
    cflat = jnp.take(flatc, jnp.minimum(idx, n * S - 1), axis=0)
    cray_d = jnp.take(ray_d, jnp.minimum(idx, n * S - 1), axis=0)
    return jnp.sum(cflat) + jnp.sum(idx) + jnp.sum(cray_d)

tA = bench("A march            ", stage_A, grid, rays, key)
tB1 = bench("B1 march+early     ", stage_B1, grid, rays, key)
tB2 = bench("B2 march+compact   ", stage_B2, grid, rays, key)
tB = bench("B +early+compact   ", stage_B, grid, rays, key)
tC = bench("C +interp          ", stage_C, grid, rays, key)
tD = bench("D +decode          ", stage_D, nef, rays, key)
tE = bench("E full fwd         ", stage_E, pipeline, rays, key)
tF = bench("F fwd+bwd          ", stage_F, pipeline, rays, key)
print(f"\ndeltas: march={tA*1e3:.1f} early/compact={(tB-tA)*1e3:.1f} "
      f"interp={(tC-tB)*1e3:.1f} decode={(tD-tC)*1e3:.1f} integrate={(tE-tD)*1e3:.1f} "
      f"bwd+rest={(tF-tE)*1e3:.1f} total={tF*1e3:.1f}", flush=True)
