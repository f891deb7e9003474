"""2D image fitting app (reference app/image/main_image.py).

Trains an ImageNeuralField (2D HashGrid + MLP) to overfit one image; the cheap end-to-end
smoke workload. With --dataset-path omitted, a procedural test image is generated (this
environment ships no image datasets).
"""

import dataclasses
import logging
import os
import sys
import tempfile
from typing import Optional

# Allow running as a plain script: put the repo root on sys.path.
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from wisp_tpu.app_utils import apply_device, default_log_setup
from wisp_tpu.config import (parse_config, configure, autoconfig, instantiate, print_config)
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs import ImageNeuralField
from wisp_tpu.datasets import ImageDataset
from wisp_tpu.trainers import ImageTrainer, ConfigBaseTrainer, load_pipeline
from wisp_tpu.trainers.tracker import Tracker, ConfigTracker


def make_test_image(path: str, size: int = 512) -> None:
    """Procedural RGB test image: smooth gradients + high-frequency rings, enough detail to
    exercise the multiresolution hash levels."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    img = np.stack([
        0.5 + 0.5 * np.sin(40.0 * r * np.pi) * np.exp(-3 * r),
        np.abs(np.sin(6 * np.pi * x) * np.cos(4 * np.pi * y)),
        y * x + 0.25 * np.sin(24 * np.pi * (x + y)),
    ], axis=-1)
    img = np.clip(img, 0.0, 1.0)
    from wisp_tpu.ops.image.io import write_png
    write_png(path, img)


@dataclasses.dataclass
class ImageAppConfig:
    nef: autoconfig(ImageNeuralField) = None
    grid: autoconfig(HashGrid.from_geometric) = None
    dataset: autoconfig(ImageDataset) = None
    trainer: ConfigBaseTrainer = None
    tracker: ConfigTracker = None
    scaling_factor: float = 2.0
    valid_only: bool = False
    log_level: int = logging.INFO
    profile: bool = False
    pretrained: Optional[str] = None
    device: str = "tpu"


def main(argv=None):
    cfg = parse_config(ImageAppConfig, args=argv)
    default_log_setup(cfg.log_level)
    apply_device(cfg.device)

    if not cfg.dataset.dataset_path:
        cfg.dataset.dataset_path = os.path.join(tempfile.gettempdir(), "wisp_tpu_test_img.png")
        make_test_image(cfg.dataset.dataset_path)
        logging.info(f"No --dataset.dataset-path given; generated procedural test image at "
                     f"{cfg.dataset.dataset_path}")

    train_dataset = instantiate(cfg.dataset)

    # Max grid res = image res / scaling factor (instant-ngp procedure, main_image.py:59-62)
    res = int(max(train_dataset.h, train_dataset.w) // cfg.scaling_factor)
    cfg.grid.max_grid_res = res
    cfg.grid.coord_dim = 2
    grid = instantiate(cfg.grid, blas=None)

    if cfg.pretrained and cfg.trainer.model_format == "full":
        pipeline = load_pipeline(cfg.pretrained)
    else:
        nef = instantiate(cfg.nef, grid=grid)
        pipeline = Pipeline(nef=nef)

    print_config(cfg)

    tracker = Tracker(cfg=cfg.tracker, exp_name=cfg.trainer.exp_name)
    tracker.save_app_config(cfg)
    trainer = ImageTrainer(cfg=cfg.trainer, pipeline=pipeline,
                           train_dataset=train_dataset, tracker=tracker)

    if cfg.valid_only:
        trainer.validate()
        return trainer.return_dict
    result = trainer.train()
    trainer.validate()
    return trainer.return_dict


if __name__ == "__main__":
    main()
