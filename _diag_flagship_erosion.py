"""Render-only ablations on a flagship checkpoint to localize the erosion (round 5).

The r5-flagship run (EXACT backward) eroded like round-4's stoch run: loss bottomed at
epoch 15 (pruning starts at 10), PSNR 29.13 @25 -> 26.29 @50. Checkpoint forensics vs
the analytic GT: 40.9% of GT SURFACE cells culled by epoch 66, culled surface cells
DENSER than kept. This script renders validation views from the checkpoint under
ablations to separate field damage from render-path effects:

  base        as trained/rendered during the run
  stride1     exact per-sample occupancy march (no stride-2 OR-bracket)
  noearly     tracer transmittance early-termination off
  fullcomp    no compaction budget at render
  gtocc       occupancy bitfield + early-term density replaced by the ANALYTIC GT
              occupancy (dilated 1): if PSNR recovers, the damage is the culled
              occupancy mask, i.e. the prune — the features under culled cells are fine
  gtocc_exact gtocc + stride1 + noearly (upper bound of what the field still knows)

Usage: python _diag_flagship_erosion.py [run_dir] [n_views]
Runs on the REAL TPU (do not run while another TPU process is live).
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

RUN = sys.argv[1] if len(sys.argv) > 1 else \
    "_results/logs/runs/nerf-hash-lego-proxy/r5-flagship"
N_VIEWS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    from app.nerf.main_nerf import NeRFAppConfig
    from wisp_tpu.config import parse_config, instantiate
    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.models.pipeline import Pipeline
    from wisp_tpu.trainers.multiview_trainer import MultiviewTrainer
    from wisp_tpu.trainers.tracker import Tracker, ConfigTracker
    from wisp_tpu.trainers.checkpoint import restore_checkpoint
    from wisp_tpu.ops.image.metrics import psnr as psnr_fn

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
    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir="/tmp/wisp_diag"), "diag")
    trainer = MultiviewTrainer(cfg=cfg.trainer, pipeline=pipeline,
                               train_dataset=train_dataset,
                               validation_dataset=valid, tracker=tracker)
    restore_checkpoint(trainer, f"{RUN}/train_state.pkl")
    base_pipeline = trainer.sync_pipeline()
    print(f"restored epoch {trainer.epoch}", flush=True)

    # analytic GT occupancy at the blas level (dilated 1 for marcher tolerance)
    lvl = base_pipeline.nef.grid.blas.max_level
    res = 2 ** lvl
    from wisp_tpu.datasets.random_view_dataset import scene_density_color
    ix = np.arange(res)
    g = np.stack(np.meshgrid(ix, ix, ix, indexing="ij"), -1).reshape(-1, 3)
    centers = (g + 0.5) / res * 2 - 1
    dens = np.zeros(res ** 3, np.float32)
    B = 2 ** 20
    # MUST be jitted: eager dispatch over the TPU tunnel is 1-6 s PER OP (CLAUDE.md)
    dens_fn = jax.jit(lambda p: scene_density_color(p)[0][:, 0])
    for i in range(0, res ** 3, B):
        dens[i:i + B] = np.asarray(dens_fn(jnp.asarray(centers[i:i + B], jnp.float32)))
    gt_occ = (dens > 0.5).reshape(res, res, res)
    dil = gt_occ.copy()
    for ax in range(3):
        for sh in (1, -1):
            dil |= np.roll(gt_occ, sh, axis=ax)
    gt_bitfield = jnp.asarray(dil.reshape(-1))
    gt_density_field = jnp.where(gt_bitfield, jnp.asarray(dens), -1.0)

    def gt_blas(blas_in):
        return blas_in.update_occupancy(gt_bitfield, cell_density=gt_density_field)

    def variant(name, tracer_kw=None, use_gt_occ=False):
        p = base_pipeline
        if use_gt_occ:
            grid2 = p.nef.grid.replace(blas=gt_blas(p.nef.grid.blas))
            p = p.replace(nef=p.nef.replace(grid=grid2))
        if tracer_kw:
            p = p.replace(tracer=p.tracer.replace(**tracer_kw))
        trainer._infer_seg_cache = None  # static tracer config changed -> fresh jit
        data = valid.data
        scores = []
        for i in range(min(N_VIEWS, len(valid))):
            rgb = trainer.render_view(p, data["rays"][i])
            scores.append(float(psnr_fn(rgb, np.asarray(data["rgb"][i]))))
        out = {"psnr": round(float(np.mean(scores)), 2),
               "per_view": [round(s, 2) for s in scores]}
        print(name, json.dumps(out), flush=True)
        return out

    results = {
        "base": variant("base"),
        "stride1": variant("stride1", {"march_stride": 1}),
        "noearly": variant("noearly", {"early_stop": 0.0}),
        "fullcomp": variant("fullcomp", {"compaction": 0.25}),
        "gtocc": variant("gtocc", use_gt_occ=True),
        "gtocc_exact": variant("gtocc_exact", {"march_stride": 1, "early_stop": 0.0},
                               use_gt_occ=True),
    }
    print(json.dumps({k: v["psnr"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
