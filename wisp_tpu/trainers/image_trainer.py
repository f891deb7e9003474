"""ImageTrainer — 2D image overfitting (reference wisp/trainers/image_trainer.py:41-185).

Step: sample pixel batch → nef.rgb(coords) → MSE; validate: render the full image in chunks,
compute PSNR (+SSIM/LPIPS when requested), append a parquet record with flattened config.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.ops.image.metrics import psnr as psnr_fn, ssim as ssim_fn, lpips as lpips_fn
from wisp_tpu.trainers.base_trainer import BaseTrainer

log = logging.getLogger(__name__)


class ImageTrainer(BaseTrainer):
    def pre_training(self):
        super().pre_training()
        self.tracker.metrics.define_metric("rgb_loss", aggregation_type=float)

    def compute_loss(self, pipeline, batch, key):
        coords, rgb = batch
        rgb_pred = pipeline.nef.rgb(coords)
        rgb_loss = jnp.mean((rgb_pred - rgb) ** 2)
        return rgb_loss, {"rgb_loss": rgb_loss}

    def step(self, data):
        coords, rgb = data
        batch = (jnp.asarray(coords), jnp.asarray(rgb))
        loss, aux = self.run_step(batch)
        loss = float(loss)
        self.tracker.metrics.total_loss += loss
        self.tracker.metrics.rgb_loss += float(aux["rgb_loss"])

    def log_console(self):
        total_loss = self.tracker.metrics.average_metric("total_loss")
        rgb_loss = self.tracker.metrics.average_metric("rgb_loss")
        log.info("EPOCH {}/{} | total loss: {:>.3E} | rgb loss: {:>.3E}".format(
            self.epoch, self.max_epochs, total_loss, rgb_loss))

    def render_full_image(self, chunk: int = 2 ** 20) -> np.ndarray:
        """Infer the full image in chunks through the current pipeline
        (reference image_trainer.py:110-124)."""
        pipeline = self.sync_pipeline()
        coords = self.train_dataset.coords

        @jax.jit
        def infer(nef, c):
            return nef.rgb(c)

        out = []
        for i in range(0, coords.shape[0], chunk):
            out.append(np.asarray(infer(pipeline.nef, jnp.asarray(coords[i:i + chunk]))))
        return np.concatenate(out).reshape(self.train_dataset.h, self.train_dataset.w, 3)

    def validate(self) -> Dict[str, Any]:
        """Full-image render + metrics + parquet record
        (reference image_trainer.py:95-185)."""
        record_dict = self.tracker.get_record_dict() or {}
        img = self.render_full_image()
        gt = np.asarray(self.train_dataset.get_image())

        metrics = {}
        if "psnr" in self.cfg.valid_metrics:
            metrics["psnr"] = psnr_fn(img, gt)
        if "ssim" in self.cfg.valid_metrics:
            metrics["ssim"] = ssim_fn(img, gt)
        if "lpips" in self.cfg.valid_metrics:
            from wisp_tpu.ops.image.metrics import lpips_available
            if lpips_available():
                metrics["lpips"] = lpips_fn(img, gt)
            elif not getattr(self, "_lpips_drop_warned", False):
                log.warning("'lpips' in valid_metrics but no weights configured "
                            "(set WISP_LPIPS_WEIGHTS); dropping the metric")
                self._lpips_drop_warned = True

        log_text = "EPOCH {}/{}".format(self.epoch, self.max_epochs)
        for k, v in metrics.items():
            log_text += " | {}: {:.2f}".format(k, v)
            self.tracker.log_metric(f"validation/{k}", v, self.epoch)
        log.info(log_text)

        from wisp_tpu.ops.image.io import write_png
        write_png(os.path.join(self.tracker.log_dir, f"img_ep{self.epoch}.png"), img)

        record_dict.update(metrics)
        record_dict["epoch"] = self.epoch
        try:
            import pandas as pd
            parquet_path = os.path.join(self.tracker.log_dir, "logs.parquet")
            df = pd.DataFrame([record_dict])
            if os.path.exists(parquet_path):
                df = pd.concat([pd.read_parquet(parquet_path), df], ignore_index=True)
            df.to_parquet(parquet_path)
        except Exception as e:  # noqa: BLE001
            log.warning(f"parquet record write failed: {e}")

        self.return_dict.update(metrics)
        return metrics
