"""NGLOD app (reference app/nglod/main_nglod.py): neural SDF training over octree / hash /
triplanar feature grids with sphere-traced visualization.

Without a mesh path, a procedural icosphere mesh is used (no .obj assets ship in this
environment); its analytic SDF makes the IoU validation a strong correctness check.
"""

import dataclasses
import logging
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from wisp_tpu.app_utils import apply_device, default_log_setup
from wisp_tpu.config import parse_config, autoconfig, instantiate, print_config
from wisp_tpu.accelstructs import OctreeAS, MeshExtent
from wisp_tpu.models.grids import OctreeGrid, HashGrid, TriplanarGrid
from wisp_tpu.models.nefs.neural_sdf import NeuralSDF, NeuralSDFTex
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.tracers.packed_sdf_tracer import PackedSDFTracer
from wisp_tpu.datasets.formats.mesh_sampled_sdf import MeshSampledSDFDataset
from wisp_tpu.datasets.formats.octree_sampled_sdf import OctreeSampledSDFDataset
from wisp_tpu.trainers import load_pipeline
from wisp_tpu.trainers.sdf_trainer import ConfigSDFTrainer, SDFTrainer
from wisp_tpu.trainers.tracker import Tracker, ConfigTracker
from wisp_tpu.trainers.tracker.offline_renderer import OfflineRenderer


@dataclasses.dataclass
class NGLODAppConfig:
    mesh_path: Optional[str] = None
    blas_level: int = 5
    num_samples_on_mesh: int = 1000000
    grid: autoconfig(OctreeGrid, HashGrid.from_geometric, TriplanarGrid) = None
    nef: autoconfig(NeuralSDF, NeuralSDFTex) = None
    tracer: autoconfig(PackedSDFTracer) = None
    dataset: autoconfig(MeshSampledSDFDataset, OctreeSampledSDFDataset) = None
    trainer: ConfigSDFTrainer = None
    tracker: ConfigTracker = None
    log_level: int = logging.INFO
    pretrained: Optional[str] = None
    device: str = "tpu"
    valid_only: bool = False


def main(argv=None):
    cfg = parse_config(NGLODAppConfig, args=argv)
    default_log_setup(cfg.log_level)
    apply_device(cfg.device)

    if cfg.mesh_path:
        blas = OctreeAS.from_mesh(cfg.mesh_path, level=cfg.blas_level,
                                  num_samples=cfg.num_samples_on_mesh)
        vertices, faces = blas.extent.vertices, blas.extent.faces
    else:
        from wisp_tpu.ops.mesh import make_sphere_mesh, normalize, sample_surface
        from wisp_tpu.ops.spc.core import quantize_points
        vertices, faces = make_sphere_mesh(radius=1.0, subdivisions=3)
        vertices, faces = normalize(vertices, faces, "sphere")
        samples = sample_surface(vertices, faces, 2000000)
        blas = OctreeAS.from_quantized_points(
            quantize_points(samples, cfg.blas_level), cfg.blas_level)
        blas.extent = MeshExtent(vertices, faces)
        logging.info("No --mesh-path given; using procedural icosphere mesh")

    # dataset: the chosen format decides its inputs — octree-sampled needs the mesh-bearing
    # blas, mesh-sampled needs the raw mesh (reference main_nglod wiring)
    if "Octree" in type(cfg.dataset).__name__:
        assert OctreeSampledSDFDataset.supports_blas(blas)
        train_dataset = instantiate(cfg.dataset, blas=blas)
    elif getattr(cfg.dataset, "sample_tex", False):
        # texture-SDF path (reference mesh_sdf_dataset.py:197-205): a materialed .obj is
        # loaded by the dataset itself; without a mesh path the procedural sphere gets a
        # planar-projected UV map + smooth procedural texture so NeuralSDFTex has a
        # learnable rgb ground truth
        if cfg.mesh_path:
            train_dataset = instantiate(cfg.dataset, dataset_path=cfg.mesh_path)
        else:
            texv = ((vertices[:, :2] + 1.0) / 2.0).astype(np.float32)
            texf = faces.copy()
            uu, vv = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
            tex = np.stack([0.5 + 0.5 * np.sin(6.28 * uu),
                            0.5 + 0.5 * np.cos(6.28 * vv),
                            0.5 + 0.5 * np.sin(3.14 * (uu + vv))],
                           axis=-1).astype(np.float32)
            train_dataset = instantiate(
                cfg.dataset, vertices=vertices, faces=faces, texv=texv, texf=texf,
                materials=[{"diffuse_texname": tex}],
                face_mats=np.zeros(len(faces), np.int32))
    else:
        train_dataset = instantiate(cfg.dataset, vertices=vertices, faces=faces)

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
    trainer = SDFTrainer(cfg=cfg.trainer, pipeline=pipeline,
                         train_dataset=train_dataset, tracker=tracker)

    if cfg.valid_only:
        trainer.validate()
        return trainer.return_dict
    trainer.train()
    trainer.validate()
    return trainer.return_dict


if __name__ == "__main__":
    main()
