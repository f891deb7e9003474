"""Repro the bench cold-phase 'Array has been deleted' (float32[2097152]).

CPU-only; builds two bench-style trainers on the SAME blas object (the bench does this
when early_stop==0.0: blas is blas_cold) and reports which shared leaves trainer1's
donated step deleted before trainer2 runs.
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.core import Rays
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers import PackedRFTracer
from wisp_tpu.config.presets import ConfigAdamW
from wisp_tpu.trainers.multiview_trainer import ConfigMultiviewTrainer, MultiviewTrainer
from wisp_tpu.trainers.tracker import ConfigTracker, Tracker

from wisp_tpu.datasets.random_view_dataset import scene_density_color

rng0 = np.random.default_rng(3)
pts = rng0.uniform(-1.0, 1.0, (50000, 3)).astype(np.float32)
dens, _ = scene_density_color(jnp.asarray(pts))
pc = pts[np.asarray(dens[:, 0]) > 1.0]
blas = OctreeAS.from_pointcloud(pc, 7, dilate=1)

num_rays, num_steps, iters = 256, 32, 2

rng = np.random.default_rng(0)
eye = np.asarray([0.0, 0.0, -3.0], np.float32)
dirs = rng.normal(size=(num_rays, 3)).astype(np.float32)
dirs[:, 2] = np.abs(dirs[:, 2]) + 2.0
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
origins = np.broadcast_to(eye, (num_rays, 3)).copy()
gts = rng.random((num_rays, 3)).astype(np.float32)


def build(blas_in):
    grid = HashGrid.from_geometric(blas=blas_in, feature_dim=2, num_lods=4,
                                   multiscale_type="cat", feature_std=1e-9,
                                   codebook_bitwidth=15, min_grid_res=16,
                                   max_grid_res=128, dense_lod_matmul="bf16",
                                   key=jax.random.PRNGKey(1))
    nef = NeuralRadianceField(grid=grid, view_embedder="positional", view_multires=4,
                              hidden_dim=16, num_layers=1, bias=True,
                              key=jax.random.PRNGKey(2))
    tracer = PackedRFTracer(raymarch_type="ray", num_steps=num_steps,
                            bg_color=(0.0, 0.0, 0.0), compaction=0.25,
                            early_stop=0.0, march_stride=2)
    pipeline = Pipeline(nef=nef, tracer=tracer)
    cfg = ConfigMultiviewTrainer(optimizer=ConfigAdamW(lr=1e-3),
                                 grid_lr_weight=500.0, rgb_loss_type="huber",
                                 max_epochs=1, prune_every=-1, render_every=-1,
                                 valid_every=-1, save_every=-1, exp_name="bench")

    class _DS:
        cameras = {}
        transform = None

        def __len__(self):
            return iters

    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir="/tmp/wisp_benchprobe"),
                      "bench")
    return MultiviewTrainer(cfg=cfg, pipeline=pipeline, train_dataset=_DS(),
                            tracker=tracker)


def deleted_leaves(tag, tree):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if isinstance(leaf, jax.Array):
            try:
                leaf._check_if_deleted()
            except RuntimeError:
                out.append((tag, jax.tree_util.keystr(path), leaf.shape))
    return out


t1 = build(blas)
t1._step_fn = t1._build_step()
rays = Rays(jnp.asarray(origins), jnp.asarray(dirs), 0.0, 6.0)
batch = (rays, jnp.asarray(gts), jnp.asarray(0, jnp.int32))
for _ in range(2):
    loss, aux = t1.run_step(batch)
print("t1 ok, loss", float(loss))

dels = deleted_leaves("blas", blas)
print("deleted blas leaves after t1:", dels)

t2 = build(blas)
t2._step_fn = t2._build_step()
try:
    loss2, _ = t2.run_step(batch)
    print("t2 ok, loss", float(loss2))
except RuntimeError as e:
    print("t2 FAILED:", e)
    print("deleted in t2 diff:", deleted_leaves("diff", t2._diff))
    print("deleted in t2 nondiff:", deleted_leaves("nondiff", t2._nondiff))
