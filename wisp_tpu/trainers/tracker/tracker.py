"""Tracker — experiment tracking facade (reference wisp/trainers/tracker/tracker.py:91-469).

Fans out metrics/images/configs to dashboards (TensorBoard always available here; wandb gated
behind an import guard like the reference tracker.py:26-34), owns the MetricsBoard and an
optional offline visualizer, and produces flattened record dicts for parquet logs.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

from wisp_tpu.config.utils import config_to_dict
from wisp_tpu.trainers.tracker.metrics import MetricsBoard

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ConfigVisCameras:
    """Camera settings for offline visualizations (reference tracker.py:37-61)."""
    camera_origin: Tuple[float, float, float] = (-3.0, 0.65, -3.0)
    camera_lookat: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    camera_fov: float = 30.0
    camera_clamp: Tuple[float, float] = (0.0, 10.0)
    viz360_num_angles: int = 20
    viz360_radius: float = 3.0
    viz360_render_all_lods: bool = False


@dataclasses.dataclass
class ConfigTracker:
    """Tracker config (reference tracker.py:64-89)."""
    log_dir: str = "_results/logs/runs"
    # Pin the per-run subdirectory (default: a fresh timestamp). A watchdog relaunch passes
    # the original run_name so the restarted process resumes INTO the same run dir —
    # parquet/tfevents/checkpoints stay continuous across restarts.
    run_name: Optional[str] = None
    tensorboard: bool = True
    wandb: bool = False
    wandb_project: Optional[str] = None
    wandb_entity: Optional[str] = None
    wandb_run_name: Optional[str] = None
    visualizer: bool = True
    vis_camera: ConfigVisCameras = dataclasses.field(default_factory=ConfigVisCameras)


class _BaseDashboard:
    def log_metric(self, metric, value, step):
        pass

    def log_image(self, name, image, step):
        pass

    def log_config(self, config):
        pass

    def log_table(self, name, record, step):
        pass

    def log_artifact(self, model_fname, names):
        pass

    def teardown(self):
        pass


class _Tensorboard(_BaseDashboard):
    """TensorBoard dashboard (reference tracker.py:376-409)."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter
        self.writer = SummaryWriter(log_dir=log_dir)

    def log_metric(self, metric, value, step):
        self.writer.add_scalar(metric, value, step)

    def log_image(self, name, image, step):
        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[-1] in (1, 3, 4):
            arr = np.moveaxis(arr, -1, 0)
        self.writer.add_image(name, arr, step)

    def log_table(self, name, record, step):
        text = "\n".join(f"| {k} | {v} |" for k, v in record.items())
        self.writer.add_text(name, f"| key | value |\n|---|---|\n{text}", step)

    def teardown(self):
        self.writer.close()


class _WandB(_BaseDashboard):
    """Weights & Biases dashboard (reference tracker.py:412-469); gated on import."""

    def __init__(self, project, entity, run_name, config):
        import wandb
        self.wandb = wandb
        wandb.init(project=project, entity=entity, name=run_name, config=config)

    def log_metric(self, metric, value, step):
        self.wandb.log({metric: value}, step=step)

    def log_image(self, name, image, step):
        self.wandb.log({name: self.wandb.Image(np.asarray(image))}, step=step)

    def log_artifact(self, model_fname, names):
        artifact = self.wandb.Artifact(os.path.basename(model_fname), type="model")
        artifact.add_file(model_fname)
        self.wandb.log_artifact(artifact, aliases=names)

    def teardown(self):
        self.wandb.finish()


class Tracker:
    def __init__(self, cfg: ConfigTracker, exp_name: str):
        self.cfg = cfg
        self.exp_name = exp_name
        self.log_dir = os.path.join(cfg.log_dir, exp_name,
                                    cfg.run_name or time.strftime("%Y%m%d-%H%M%S"))
        os.makedirs(self.log_dir, exist_ok=True)

        self.metrics = MetricsBoard()
        self.visualizer = None  # OfflineRenderer attached by trainers that render snapshots
        self._app_config = None

        self.dashboards = []
        if cfg.tensorboard:
            try:
                self.dashboards.append(_Tensorboard(self.log_dir))
            except ImportError:
                log.warning("tensorboard unavailable; skipping dashboard")
        if cfg.wandb:
            try:
                self.dashboards.append(_WandB(cfg.wandb_project, cfg.wandb_entity,
                                              cfg.wandb_run_name or exp_name,
                                              None))
            except ImportError:
                log.warning("wandb unavailable; skipping dashboard (reference gates this too)")

    def set_visualizer(self, visualizer) -> None:
        self.visualizer = visualizer

    # -- app config capture (reference tracker.py:130-172) ------------------------------------
    def save_app_config(self, cfg) -> None:
        self._app_config = cfg

    def get_app_config(self, as_dict: bool = False):
        if self._app_config is None:
            return None
        return config_to_dict(self._app_config) if as_dict else self._app_config

    def get_record_dict(self) -> Optional[Dict[str, Any]]:
        """Flattened config dict for parquet records (reference tracker.py:150-172)."""
        if self._app_config is None:
            return None
        flat = {}

        def _flatten(d, prefix=""):
            for k, v in d.items():
                if isinstance(v, dict):
                    _flatten(v, f"{prefix}{k}/")
                else:
                    flat[f"{prefix}{k}"] = str(v) if isinstance(v, (list, tuple)) else v
        _flatten(config_to_dict(self._app_config))
        flat["log_fname"] = os.path.basename(self.log_dir)
        return flat

    # -- fan-out API (reference tracker.py:213-253) --------------------------------------------
    def log_metric(self, metric: str, value, step: int) -> None:
        for d in self.dashboards:
            d.log_metric(metric, value, step)

    def log_image(self, name: str, image, step: int) -> None:
        for d in self.dashboards:
            d.log_image(name, image, step)

    def log_table(self, name: str, record: Dict, step: int) -> None:
        for d in self.dashboards:
            d.log_table(name, record, step)

    def log_config(self, config) -> None:
        for d in self.dashboards:
            d.log_config(config)

    def log_artifact(self, model_fname: str, names) -> None:
        for d in self.dashboards:
            d.log_artifact(model_fname, names)

    def log_360_orbit(self, pipeline, step: int = 0) -> None:
        """Render a 360° orbit animation and log it (reference tracker.py:255-315)."""
        if self.visualizer is None:
            return
        frames = self.visualizer.render_360(pipeline,
                                            num_angles=self.cfg.vis_camera.viz360_num_angles,
                                            radius=self.cfg.vis_camera.viz360_radius)
        for i, frame in enumerate(frames):
            self.log_image(f"360/{i}", frame, step)

    def teardown(self) -> None:
        for d in self.dashboards:
            d.teardown()
