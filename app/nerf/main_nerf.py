"""NeRF app (reference app/nerf/main_nerf.py): instant-ngp style NeRF training over
multiview datasets with a choice of grids (hash / octree / triplanar / codebook).

With --dataset.constructor RandomViewDataset (the default when no dataset path is given),
a procedural synthetic scene is used — this environment ships no lego/RTMV data.
"""

import dataclasses
import logging
import os
import sys
from typing import Optional, Union

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from wisp_tpu.app_utils import apply_device, default_log_setup
from wisp_tpu.config import parse_config, autoconfig, instantiate, print_config
from wisp_tpu.accelstructs import OctreeAS, AxisAlignedBBoxAS
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers.packed_rf_tracer import PackedRFTracer
from wisp_tpu.datasets.formats.nerf_standard import NeRFSyntheticDataset
from wisp_tpu.datasets.formats.rtmv import RTMVDataset
from wisp_tpu.datasets.random_view_dataset import RandomViewDataset
from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
from wisp_tpu.trainers import load_pipeline
from wisp_tpu.trainers.multiview_trainer import ConfigMultiviewTrainer, MultiviewTrainer
from wisp_tpu.trainers.tracker import Tracker, ConfigTracker
from wisp_tpu.trainers.tracker.offline_renderer import OfflineRenderer


def _grid_configs():
    ctors = [HashGrid.from_geometric, HashGrid.from_octree]
    try:
        from wisp_tpu.models.grids import TriplanarGrid, CodebookOctreeGrid, OctreeGrid
        ctors += [OctreeGrid, TriplanarGrid, CodebookOctreeGrid]
    except ImportError:
        pass  # grid zoo still landing; hash grids always available
    return autoconfig(*ctors)


@dataclasses.dataclass
class NeRFAppConfig:
    blas_level: int = 7
    sparse_blas: bool = False
    nef: autoconfig(NeuralRadianceField) = None
    grid: None = None  # filled below (needs lazy import of the full grid zoo)
    tracer: autoconfig(PackedRFTracer) = None
    dataset: autoconfig(NeRFSyntheticDataset, RTMVDataset, RandomViewDataset) = None
    dataset_transform: autoconfig(SampleRays) = None
    trainer: ConfigMultiviewTrainer = None
    tracker: ConfigTracker = None
    log_level: int = logging.INFO
    pretrained: Optional[str] = None
    device: str = "tpu"
    valid_only: bool = False


NeRFAppConfig.__annotations__["grid"] = _grid_configs()


def main(argv=None):
    cfg = parse_config(NeRFAppConfig, args=argv)
    default_log_setup(cfg.log_level)
    apply_device(cfg.device)

    transform = instantiate(cfg.dataset_transform)
    train_dataset = instantiate(cfg.dataset, transform=transform)
    validation_dataset = train_dataset.create_split(
        cfg.trainer.valid_split if cfg.trainer.valid_split else "val", transform=None)

    # BLAS: dense octree carved by pruning (reference main_nerf.py:92-101 uses
    # OctreeAS.make_dense(blas_level); RTMV-style depth datasets pre-prune from pointcloud).
    # --sparse-blas builds sparse topology from available geometry (required by OctreeGrid /
    # CodebookOctreeGrid, which store features on the sparse octree).
    pc = train_dataset.as_pointcloud()
    if pc is None and cfg.sparse_blas and hasattr(train_dataset, "scene_pointcloud"):
        pc = train_dataset.scene_pointcloud()
    if pc is not None:
        blas = OctreeAS.from_pointcloud(pc, cfg.blas_level, dilate=2)
    else:
        blas = OctreeAS.make_dense(cfg.blas_level)

    grid = instantiate(cfg.grid, blas=blas)
    tracer = instantiate(cfg.tracer)

    if cfg.pretrained and cfg.trainer.model_format == "full":
        pipeline = load_pipeline(cfg.pretrained)
    else:
        nef = instantiate(cfg.nef, grid=grid)
        pipeline = Pipeline(nef=nef, tracer=tracer)

    print_config(cfg)

    tracker = Tracker(cfg=cfg.tracker, exp_name=cfg.trainer.exp_name)
    tracker.save_app_config(cfg)
    tracker.set_visualizer(OfflineRenderer(render_res=(512, 512)))
    trainer = MultiviewTrainer(cfg=cfg.trainer, pipeline=pipeline,
                               train_dataset=train_dataset,
                               validation_dataset=validation_dataset,
                               tracker=tracker)

    if cfg.valid_only:
        trainer.validate()
        return trainer.return_dict
    trainer.train()
    trainer.validate()
    return trainer.return_dict


if __name__ == "__main__":
    main()
