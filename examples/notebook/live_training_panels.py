"""Live training + editable property panels (notebook demo).

The TPU-honest counterpart of the reference's interactive imgui workflow
(wisp/renderer/gui/imgui/): training runs as a background task while ipywidgets panels
EDIT the shared WispState live — camera fov/distance/mode, render channel, tracer steps /
background / early-stop, pause/resume — through the declarative control surface
(wisp_tpu/renderer/gui/controls.py). Every edit fires the same watchedfields events the
app loop listens to, so the next rendered frame reflects it.

In a notebook:

    from examples.notebook.live_training_panels import build_demo
    app, panels, step = build_demo()
    display(panels)              # the editing surface (ipywidgets Accordion)
    for _ in range(200):         # drive training; re-render happens in app.run ticks
        app.run(max_iterations=1, render_every=1)

As a plain script (headless CI / smoke): runs a few steps, programmatically pokes the
controls, and verifies frames land on disk.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def build_demo(out_dir: str = "/tmp/live_training_panels", epochs: int = 2):
    import jax
    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.config.presets import ConfigAdamW
    from wisp_tpu.datasets.random_view_dataset import RandomViewDataset
    from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
    from wisp_tpu.framework.state import WispState
    from wisp_tpu.models.grids import HashGrid
    from wisp_tpu.models.nefs.nerf import NeuralRadianceField
    from wisp_tpu.models.pipeline import Pipeline
    from wisp_tpu.renderer import OptimizationApp
    from wisp_tpu.renderer.app.wisp_app import DiskPresenter
    from wisp_tpu.tracers import PackedRFTracer
    from wisp_tpu.trainers.multiview_trainer import (ConfigMultiviewTrainer,
                                                     MultiviewTrainer)
    from wisp_tpu.trainers.tracker import ConfigTracker, Tracker

    grid = HashGrid.from_geometric(blas=OctreeAS.make_dense(4), feature_dim=2, num_lods=4,
                                   codebook_bitwidth=12, min_grid_res=8, max_grid_res=64,
                                   multiscale_type="cat", feature_std=1e-9,
                                   key=jax.random.PRNGKey(0))
    nef = NeuralRadianceField(grid=grid, view_embedder="positional", hidden_dim=32,
                              bias=True, key=jax.random.PRNGKey(1))
    pipeline = Pipeline(nef, PackedRFTracer(raymarch_type="ray", num_steps=64,
                                            bg_color=(0.0, 0.0, 0.0)))

    dataset = RandomViewDataset(num_views=6, height=32, width=32,
                                transform=SampleRays(512))
    cfg = ConfigMultiviewTrainer(
        optimizer=ConfigAdamW(lr=1e-3, eps=1e-15, weight_decay=1e-6),
        grid_lr_weight=100.0, max_epochs=epochs, prune_every=-1, render_every=-1,
        valid_every=-1, save_every=-1, exp_name="nerf")
    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir=out_dir), "live-panels")
    state = WispState()
    state.renderer.canvas_width = 64
    state.renderer.canvas_height = 64
    # share the app's WispState with the trainer: is_optimization_running reads
    # scene_state.optimization.running, so a separate state leaves training silently
    # inert; the trainer registers its pipeline in the shared scene graph (as "nerf")
    trainer = MultiviewTrainer(cfg=cfg, pipeline=pipeline, train_dataset=dataset,
                               tracker=tracker, scene_state=state)

    def training_tick():
        trainer.iterate()
        # hand the freshly-optimized pipeline to the renderer (functional params)
        state.graph.neural_pipelines["nerf"] = trainer.sync_pipeline()
        state.optimization.epoch = trainer.epoch
        if trainer.epoch > trainer.max_epochs:
            state.optimization.running = False

    app = OptimizationApp(state, trainer_step_func=training_tick,
                          presenter=DiskPresenter(out_dir))

    panels = None
    try:
        from wisp_tpu.renderer.gui.jupyter_panels import build_app_panels
        panels = build_app_panels(app)
    except ImportError:
        pass  # ipywidgets absent: controls remain usable programmatically

    return app, panels, training_tick


def main():
    out_dir = "/tmp/live_training_panels"
    app, panels, _ = build_demo(out_dir=out_dir)
    from wisp_tpu.renderer.gui.controls import all_panels

    app.wisp_state.optimization.running = True
    app.run(max_iterations=4, render_every=2)

    # poke the editing surface the way a notebook user would
    controls = all_panels(app)
    cam = {c.name: c for c in controls["Camera"]}
    cam["FOV (deg)"].set(60.0)
    obj = {c.name: c for c in controls["Object: nerf"]}
    obj["Background"].set("white")
    app.run(max_iterations=2, render_every=1)

    frames = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    print(f"live_training_panels: {len(frames)} frames in {out_dir}; "
          f"panels={'ipywidgets' if panels is not None else 'headless'}")
    assert frames, "no frames rendered"


if __name__ == "__main__":
    main()
