"""Test the grazing-cull hypothesis on a mid-erosion flagship checkpoint (round 5).

Hypothesis: the training tracer's transmittance early-termination estimate
``tau_hat = cell_density * delta`` (packed_rf_tracer.py:135) charges EVERY sample in an
occupied cell the cell's PEAK density. Once the learned density sharpens into a
sub-voxel shell, a ray that merely clips a high-peak cell (true tau ~0 there) gets all
its LATER samples culled -- including the true visible surface. Those samples then (a)
receive no gradient and (b) never feed the sample-fed prune keep-score, so their cells
erode -- estimator-independent, and resistant to the sample-feedback fix.

Measurement (CPU, on a copied checkpoint): march a batch of validation rays exactly as
the training step does (stride-2 occupancy march), decode ALL masked samples to get TRUE
densities, then compare the per-ray visible weight (true transmittance compositing)
against the weight that survives the tau_hat cull. Reports the distribution of
"visible weight wrongly culled" over rays.

Usage: python _probe_graze_cull.py [ckpt.pkl] [n_rays]
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fb_ckpt_e55.pkl"
N_RAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
EARLY_STOP = 0.01
STRIDE = 2
NUM_STEPS = 512


def main():
    from app.nerf.main_nerf import NeRFAppConfig
    from wisp_tpu.config import parse_config, instantiate
    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.models.pipeline import Pipeline
    from wisp_tpu.trainers.multiview_trainer import MultiviewTrainer
    from wisp_tpu.trainers.tracker import Tracker, ConfigTracker
    from wisp_tpu.trainers.checkpoint import restore_checkpoint
    from wisp_tpu.core.rays import Rays

    cfg = parse_config(NeRFAppConfig, args=[
        "--config", "app/nerf/configs/nerf_hash_lego_proxy.yaml"])
    transform = instantiate(cfg.dataset_transform)
    train_dataset = instantiate(cfg.dataset, transform=transform)
    valid = train_dataset.create_split("test", transform=None)
    blas = OctreeAS.make_dense(cfg.blas_level)
    grid = instantiate(cfg.grid, blas=blas)
    nef = instantiate(cfg.nef, grid=grid)
    tracer = instantiate(cfg.tracer)
    pipeline = Pipeline(nef=nef, tracer=tracer)
    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir="/tmp/wisp_diag"),
                      "graze")
    trainer = MultiviewTrainer(cfg=cfg.trainer, pipeline=pipeline,
                               train_dataset=train_dataset,
                               validation_dataset=valid, tracker=tracker)
    restore_checkpoint(trainer, CKPT)
    p = trainer.sync_pipeline()
    # the checkpoint restores occ_grid/cell_density ARRAYS but the freshly-built blas
    # keeps static dense=True (make_dense), which routes _sample_grid around the fused
    # occupancy+density field — flip to the pruned-state layout (see trainers/checkpoint
    # resume fix, round 5)
    blas0 = p.nef.grid.blas
    if blas0.dense:
        blas1 = blas0.update_occupancy(blas0.occ_grid, cell_density=blas0.cell_density)
        p = p.replace(nef=p.nef.replace(grid=p.nef.grid.replace(blas=blas1)))
    print(f"restored epoch {trainer.epoch}; occupied cells: "
          f"{int(np.asarray(p.nef.grid.blas.occ_grid).sum())}", flush=True)

    data = valid.data
    rays_np = data["rays"][0]
    sel = np.linspace(0, rays_np.origins.shape[0] - 1, N_RAYS).astype(int)
    rays = Rays(origins=jnp.asarray(np.asarray(rays_np.origins)[sel]),
                dirs=jnp.asarray(np.asarray(rays_np.dirs)[sel]),
                dist_min=float(np.asarray(rays_np.dist_min).reshape(-1)[0]),
                dist_max=float(np.asarray(rays_np.dist_max).reshape(-1)[0]))

    nef = p.nef

    TAU_CAP = 1.0

    @jax.jit
    def probe(rays):
        mr = nef.grid.raymarch(rays, raymarch_type="ray", num_samples=NUM_STEPS,
                               level=None, key=jax.random.PRNGKey(0), stride=STRIDE)
        deltas = jnp.broadcast_to(mr.deltas, mr.depth_samples.shape)
        mask = mr.mask
        n, s = mask.shape
        # the training tracer's tau_hat cull (packed_rf_tracer.py:130-137)
        tau_hat = mr.cell_density * deltas * mask.astype(jnp.float32)
        t_hat = jnp.exp(-(jnp.cumsum(tau_hat, axis=-1) - tau_hat))
        culled = mask & ~(t_hat > EARLY_STOP)
        # proposed fix: cap the per-sample tau estimate so one high-peak (sub-voxel
        # shell) cell can never kill a ray by itself
        tau_cap = jnp.minimum(tau_hat, TAU_CAP)
        t_cap = jnp.exp(-(jnp.cumsum(tau_cap, axis=-1) - tau_cap))
        culled_cap = mask & ~(t_cap > EARLY_STOP)
        # TRUE densities at every occupancy-masked sample
        flat = mr.samples.reshape(n * s, 3)
        ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (n, s, 3)).reshape(n * s, 3)
        out = nef(channels=["rgb", "density"], coords=flat, ray_d=ray_d)
        dens = out["density"][:, 0].reshape(n, s)
        color = out["rgb"].reshape(n, s, 3)
        tau = dens * deltas * mask.astype(jnp.float32)
        sum_prev = jnp.cumsum(tau, axis=-1) - tau
        w = jnp.exp(-sum_prev) * (1.0 - jnp.exp(-tau))      # true per-sample weight
        w_vis = jnp.sum(w, axis=-1)                          # true visible weight/ray
        w_lost = jnp.sum(w * culled.astype(w.dtype), axis=-1)
        w_lost_cap = jnp.sum(w * culled_cap.astype(w.dtype), axis=-1)
        # how much of the tau_hat cull is justified by TRUE transmittance?
        t_true = jnp.exp(-sum_prev)
        wrongly = culled & (t_true > 0.1)    # culled while ray still truly sees >10%

        def composite(keep):
            wk = jnp.where(keep, w, 0.0)
            a = jnp.sum(wk, axis=-1, keepdims=True)
            return jnp.sum(wk[..., None] * color, axis=1) + (1.0 - a)  # white bg

        rgb_full = composite(mask)
        rgb_cull = composite(mask & ~culled)
        rgb_cap = composite(mask & ~culled_cap)
        return (w_vis, w_lost, jnp.sum(wrongly, axis=-1), jnp.sum(culled, axis=-1),
                jnp.sum(mask, axis=-1), w_lost_cap, jnp.sum(culled_cap, axis=-1),
                rgb_full, rgb_cull, rgb_cap)

    (w_vis, w_lost, n_wrong, n_cull, n_mask, w_lost_cap, n_cull_cap,
     rgb_full, rgb_cull, rgb_cap) = [np.asarray(x) for x in probe(rays)]
    gt_rgb = np.asarray(data["rgb"][0]).reshape(-1, 3)[sel]

    def ray_psnr(x):
        return float(-10.0 * np.log10(np.mean((x - gt_rgb) ** 2)))
    hit = w_vis > 0.05
    frac_lost = np.where(w_vis > 1e-6, w_lost / np.maximum(w_vis, 1e-6), 0.0)
    print(f"rays={N_RAYS} hit_rays={int(hit.sum())} "
          f"masked_samples/ray={n_mask.mean():.1f} culled/ray={n_cull.mean():.1f}")
    print(f"visible-weight wrongly culled (hit rays): "
          f"mean={frac_lost[hit].mean():.4f} p50={np.percentile(frac_lost[hit],50):.4f} "
          f"p90={np.percentile(frac_lost[hit],90):.4f} "
          f"p99={np.percentile(frac_lost[hit],99):.4f}")
    print(f"rays losing >10% of true visible weight: "
          f"{(frac_lost[hit] > 0.10).mean() * 100:.2f}%  "
          f">50%: {(frac_lost[hit] > 0.50).mean() * 100:.2f}%")
    print(f"samples culled while true transmittance >0.1: "
          f"{n_wrong.sum()} ({n_wrong.sum() / max(n_cull.sum(), 1) * 100:.1f}% of culls)")
    frac_lost_cap = np.where(w_vis > 1e-6, w_lost_cap / np.maximum(w_vis, 1e-6), 0.0)
    print(f"[tau cap {1.0}] culled/ray={n_cull_cap.mean():.1f} "
          f"wrongly-culled weight mean={frac_lost_cap[hit].mean():.4f} "
          f"p99={np.percentile(frac_lost_cap[hit], 99):.4f} "
          f">10%: {(frac_lost_cap[hit] > 0.10).mean() * 100:.2f}%")
    print(f"ray-batch PSNR vs GT: full={ray_psnr(rgb_full):.2f} "
          f"tau_hat_cull={ray_psnr(rgb_cull):.2f} capped_cull={ray_psnr(rgb_cap):.2f}")


if __name__ == "__main__":
    main()
