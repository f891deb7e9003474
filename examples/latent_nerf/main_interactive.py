"""Interactive latent-nerf demo (counterpart of reference examples/latent_nerf's interactive
app): trains the custom field with OptimizationApp driving trainer.iterate as the background
task while frames render through the presenter (disk frames headless, live canvas in
jupyter)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import jax

from examples.latent_nerf.funny_neural_field import FunnyNeuralField
from wisp_tpu.accelstructs import OctreeAS
from wisp_tpu.datasets.random_view_dataset import RandomViewDataset
from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
from wisp_tpu.framework.state import WispState
from wisp_tpu.models.grids import HashGrid
from wisp_tpu.models.pipeline import Pipeline
from wisp_tpu.renderer import OptimizationApp, DiskPresenter
from wisp_tpu.renderer.core.api import add_to_scene_graph
from wisp_tpu.renderer.gizmos.primitives_painter import AxisPainter
from wisp_tpu.tracers import PackedRFTracer
from wisp_tpu.trainers.multiview_trainer import ConfigMultiviewTrainer, MultiviewTrainer
from wisp_tpu.trainers.tracker import ConfigTracker, Tracker


def main(epochs: int = 8, out_dir: str = "/tmp/latent_nerf_interactive"):
    dataset = RandomViewDataset(num_views=10, height=64, width=64,
                                transform=SampleRays(2048))
    grid = HashGrid.from_geometric(blas=OctreeAS.make_dense(4), feature_dim=2, num_lods=6,
                                   codebook_bitwidth=12, min_grid_res=8, max_grid_res=64,
                                   multiscale_type="cat", feature_std=1e-9,
                                   key=jax.random.PRNGKey(0))
    nef = FunnyNeuralField(grid=grid, key=jax.random.PRNGKey(1))
    pipeline = Pipeline(nef=nef, tracer=PackedRFTracer(raymarch_type="ray", num_steps=64))

    state = WispState()
    state.renderer.canvas_width = 128
    state.renderer.canvas_height = 128
    state.renderer.selected_canvas_channel = "color_feature"  # show the custom channel!
    state.renderer.available_canvas_channels = ["rgb", "color_feature", "depth", "alpha"]

    cfg = ConfigMultiviewTrainer(max_epochs=epochs, prune_every=-1, render_every=-1,
                                 valid_every=-1, save_every=-1, target_sample_size=32768,
                                 exp_name="latent-nerf")
    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir=out_dir), "latent-nerf")
    trainer = MultiviewTrainer(cfg=cfg, pipeline=pipeline, train_dataset=dataset,
                               tracker=tracker, scene_state=state)
    add_to_scene_graph(state, "latent-nerf", pipeline)

    def step_and_sync():
        trainer.iterate()
        # keep the renderer viewing the freshest params
        state.graph.neural_pipelines["latent-nerf"] = trainer.sync_pipeline()

    class App(OptimizationApp):
        def create_gizmos(self):
            self.gizmos["axes"] = AxisPainter()

    app = App(state, trainer_step_func=step_and_sync, presenter=DiskPresenter(out_dir))
    app.run(max_iterations=epochs * len(dataset) + 2, render_every=len(dataset))
    print(f"frames in {out_dir}; trained {trainer.epoch} epochs")


if __name__ == "__main__":
    main()
