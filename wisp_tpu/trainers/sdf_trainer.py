"""SDFTrainer — neural SDF optimization from sampled ground-truth distances.

Counterpart of reference wisp/trainers/sdf_trainer.py:22-190: per-LOD L2 loss (optionally
only the finest LOD), optional texture rgb loss, per-epoch dataset resampling, SDF slice
snapshots, volumetric-IoU validation.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.trainers.base_trainer import BaseTrainer, ConfigBaseTrainer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ConfigSDFTrainer(ConfigBaseTrainer):
    log_2d: bool = False
    only_last: bool = True
    resample: bool = False
    batch_size: int = 4096


class SDFTrainer(BaseTrainer):
    def __init__(self, cfg: ConfigSDFTrainer, pipeline, train_dataset, tracker=None,
                 scene_state=None, device=None, mesh=None):
        super().__init__(cfg=cfg, pipeline=pipeline, train_dataset=train_dataset,
                         tracker=tracker, scene_state=scene_state, device=device, mesh=mesh)
        self._batch_rng = np.random.default_rng(cfg.random_seed)
        self.iterations_per_epoch = max(len(train_dataset) // cfg.batch_size, 1)
        self.scene_state.optimization.iterations_per_epoch = self.iterations_per_epoch
        self.loss_lods = list(range(self.pipeline.nef.grid.num_lods))
        if cfg.only_last:
            self.loss_lods = self.loss_lods[-1:]

    def pre_training(self):
        super().pre_training()
        self.tracker.metrics.define_metric("l2_loss", aggregation_type=float)
        self.tracker.metrics.define_metric("rgb_loss", aggregation_type=float)

    def pre_epoch(self):
        super().pre_epoch()
        self.loss_lods = list(range(self.pipeline.nef.grid.num_lods))
        if self.cfg.only_last:
            self.loss_lods = self.loss_lods[-1:]

    def post_epoch(self):
        super().post_epoch()
        if self.cfg.resample:
            self.resample_dataset()

    def resample_dataset(self):
        if hasattr(self.train_dataset, "resample"):
            self.train_dataset.resample()

    def reset_data_iterator(self):
        self._data_iter = iter(range(self.iterations_per_epoch))

    def next_batch(self):
        next(self._data_iter)  # raises StopIteration at epoch end
        idx = self._batch_rng.integers(0, len(self.train_dataset),
                                       size=(self.cfg.batch_size,))
        return self.train_dataset[idx]

    def compute_loss(self, pipeline, batch, key):
        if not isinstance(batch, (tuple, list)):
            # packed step layout: ONE [B, 4(+3)] upload (coords | sdf | rgb?) — each
            # committed host array is its own transfer, a round trip on the remote
            # tunnel (see multiview_trainer.step)
            pts = batch[:, 0:3]
            gts = batch[:, 3:4]
            rgb_gts = batch[:, 4:7] if batch.shape[1] >= 7 else None
        else:
            pts, gts, rgb_gts = batch
        batch_size = pts.shape[0]
        sample_tex = rgb_gts is not None

        loss = 0.0
        l2_loss = 0.0
        rgb_loss = jnp.asarray(0.0)
        for lod_idx in self.loss_lods:
            if sample_tex:
                out = pipeline.nef(channels=["rgb", "sdf"], coords=pts, lod_idx=lod_idx)
                rgb_loss = rgb_loss + jnp.sum((out["rgb"] - rgb_gts[..., :3]) ** 2)
                pred = out["sdf"]
            else:
                pred = pipeline.nef(channels="sdf", coords=pts, lod_idx=lod_idx)
            l2_loss = l2_loss + jnp.sum((pred - gts) ** 2)
        loss = (l2_loss + (rgb_loss if sample_tex else 0.0)) / batch_size
        return loss, {"l2_loss": l2_loss / batch_size, "rgb_loss": rgb_loss / batch_size,
                      "host_stats": jnp.stack([loss, l2_loss / batch_size,
                                               rgb_loss / batch_size])}

    # deferred one-step stats fetch (see multiview_trainer.step: overlap the fetch RTT
    # with the next step's device compute)
    _pending_stats = None

    def step(self, data):
        n = len(data["coords"])
        rgb = data.get("rgb")
        if isinstance(data["coords"], jax.Array):
            # already device-resident — do NOT round-trip through host numpy (the pack
            # exists to SAVE transfers; forcing a device->host fetch here would cost the
            # exact RTT it removes). Pass the unpacked tuple layout instead.
            batch = (data["coords"], data["sdf"].reshape(n, -1),
                     rgb[:, :3] if rgb is not None else None)
            loss, aux = self.run_step(batch)
        else:
            sdf = np.asarray(data["sdf"], np.float32).reshape(n, -1)
            # the packed layout is positional (coords | sdf | rgb?); a multi-column sdf
            # target would make compute_loss misparse columns 4:7 as rgb
            assert sdf.shape[1] == 1, \
                f"packed SDF layout requires a 1-column sdf target, got {sdf.shape}"
            cols = [np.asarray(data["coords"], np.float32), sdf]
            if rgb is not None:
                cols.append(np.asarray(rgb, np.float32)[:, :3])
            packed = np.concatenate(cols, axis=1)
            loss, aux = self.run_step(packed)
        prev = self._pending_stats
        self._pending_stats = aux.get("host_stats")
        if prev is not None:
            self._apply_stats(prev)

    def _apply_stats(self, stats):
        s = np.asarray(stats)
        self.tracker.metrics.total_loss += float(s[0])
        self.tracker.metrics.l2_loss += float(s[1])
        self.tracker.metrics.rgb_loss += float(s[2])

    def _flush_stats(self):
        if self._pending_stats is not None:
            self._apply_stats(self._pending_stats)
            self._pending_stats = None

    def log_console(self):
        self._flush_stats()
        total_loss = self.tracker.metrics.average_metric("total_loss")
        l2_loss = self.tracker.metrics.average_metric("l2_loss")
        log.info("EPOCH {}/{} | total loss: {:>.3E} | l2 loss: {:>.3E}".format(
            self.epoch, self.max_epochs, total_loss, l2_loss))
        # expose the latest per-epoch losses to callers/tests (the reference's console
        # lines ARE its test oracle, SURVEY.md §4; returning them is the cleaner analog)
        self.return_dict["l2_loss"] = l2_loss
        self.return_dict["rgb_loss"] = self.tracker.metrics.average_metric("rgb_loss")

    def render_snapshot(self):
        """Log SDF cross-sections along x/y/z (reference sdf_trainer.py:138-154)."""
        if self.tracker.visualizer is None:
            return
        pipeline = self.sync_pipeline()

        @jax.jit
        def sdf_fn(coords):
            return pipeline.nef(channels="sdf", coords=coords)

        for dim in range(3):
            img = self.tracker.visualizer.sdf_slice(sdf_fn, dim=dim, depth=0.0)
            self.tracker.log_image(f"sdf_slice/dim{dim}", img, self.epoch)
            from wisp_tpu.ops.image.io import write_png
            write_png(os.path.join(self.tracker.log_dir,
                                   f"slice_d{dim}_ep{self.epoch}.png"), img)

    def validate(self) -> Dict[str, Any]:
        """Volumetric IoU against GT SDF samples (reference sdf_trainer.py:156-190)."""
        from wisp_tpu.ops.sdf import compute_sdf_iou
        pipeline = self.sync_pipeline()
        coords = self.train_dataset.coordinates
        gt = self.train_dataset.sdf_data

        @jax.jit
        def sdf_fn(c):
            return pipeline.nef(channels="sdf", coords=c)

        preds = []
        chunk = 65536
        for i in range(0, len(coords), chunk):
            preds.append(np.asarray(sdf_fn(jnp.asarray(coords[i:i + chunk]))))
        pred = np.concatenate(preds)

        iou = compute_sdf_iou(pred, gt)
        metrics = {"iou": iou}

        # Volumetric IoU on fresh uniform samples — a well-posed classification metric
        # (the narrowband IoU above includes on-surface samples whose GT sign is numerical
        # noise; even a perfect field scores ~0.7 there — the reference ships the same
        # caveat, sdf_trainer.py:177 "not entirely proper").
        vertices = getattr(self.train_dataset, "vertices", None)
        if vertices is None and hasattr(self.train_dataset, "blas"):
            extent = getattr(self.train_dataset.blas, "extent", None)
            if extent is not None:
                vertices, faces = extent.vertices, extent.faces
            else:
                faces = None
        else:
            faces = getattr(self.train_dataset, "faces", None)
        if vertices is not None and faces is not None:
            from wisp_tpu.ops.mesh import compute_sdf, sample_uniform
            pts = sample_uniform(50000, rng=np.random.default_rng(7))
            blas = getattr(self.train_dataset, "blas", None)
            if blas is not None:
                # narrowband-trained fields are only defined inside occupied cells; restrict
                # the volume-uniform IoU there (NGLOD relies on the octree for far-field
                # inside/outside)
                occ = np.asarray(blas.query(jnp.asarray(pts)).pidx) > -1
                pts = pts[occ]
            gt_u = compute_sdf(vertices, faces, pts)
            pred_u = np.asarray(sdf_fn(jnp.asarray(pts)))
            metrics["volumetric_iou"] = compute_sdf_iou(pred_u, gt_u)

        log_text = "EPOCH {}/{}".format(self.epoch, self.max_epochs)
        for k, v in metrics.items():
            log_text += " | validation {}: {:.4f}".format(k, v)
            self.tracker.log_metric(f"validation/{k}", v, self.epoch)
        log.info(log_text)
        self.return_dict.update(metrics)
        return metrics
