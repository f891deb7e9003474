"""Notebook-style viewing demo (counterpart of reference examples/notebook/
view_pretrained.ipynb — plain script form; wrap in a notebook to get the live ipycanvas).

Loads a checkpointed pipeline and orbits a camera around it, presenting frames through the
WispApp presenter (jupyter canvas when available, PNGs otherwise)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main(pretrained: str = None, frames: int = 8, out_dir: str = "/tmp/view_pretrained"):
    import numpy as np
    from wisp_tpu.framework.state import WispState
    from wisp_tpu.renderer import WispApp, DiskPresenter
    from wisp_tpu.renderer.core.api import add_to_scene_graph
    from wisp_tpu.renderer.web.jupyter_utils import is_interactive, live_canvas

    if pretrained:
        from wisp_tpu.trainers import load_pipeline
        pipeline = load_pipeline(pretrained)
    else:
        # no checkpoint given: build a quick SPC scene so the demo is self-contained
        from examples.spc_browser.main_spc_browser import mesh_to_colored_spc
        from wisp_tpu.models.nefs.spc_field import SPCField
        from wisp_tpu.models.pipeline import Pipeline
        from wisp_tpu.tracers import PackedSPCTracer
        blas, colors = mesh_to_colored_spc(level=6)
        pipeline = Pipeline(nef=SPCField(blas=blas, colors=colors),
                            tracer=PackedSPCTracer())

    state = WispState()
    state.renderer.canvas_width = 256
    state.renderer.canvas_height = 256
    add_to_scene_graph(state, "object", pipeline)

    app = WispApp(state, presenter=DiskPresenter(out_dir))
    if is_interactive():
        live_canvas(app)
    # orbit
    for i in range(frames):
        app.on_mouse_drag(40.0, 0.0)
        frame = app.render()
        app.presenter.present(frame, i)
    print(f"{frames} orbit frames -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
