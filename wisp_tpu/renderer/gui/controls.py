"""Editable property controls — the WRITE surface of the GUI layer.

Counterpart of the reference's imgui property panels (wisp/renderer/gui/imgui/, 14 widgets
~1400 LoC) which let users *edit* camera / renderer / tracer / optimization properties
live. There is no display stack on TPU pods, so the editing surface is declarative: each
panel is a list of :class:`Control` descriptors whose getters/setters bind directly to the
shared :class:`WispState` (firing the watchedfields events the rest of the app already
listens to, framework/event.py) or to app actions. Any front-end renders them —
``jupyter_panels.py`` binds them to ipywidgets; a TUI or web UI could bind the same list.

Mutability note: pipelines/tracers are immutable pytrees, so tracer edits write a
``.replace()``d pipeline back into ``state.graph.neural_pipelines`` and mark the canvas
dirty — the RendererCore picks the new object up on the next redraw (render_core.py:73-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from wisp_tpu.framework.state import WispState


@dataclasses.dataclass
class Control:
    """One editable property: a front-end-agnostic descriptor."""
    name: str
    kind: str                               # 'float' | 'int' | 'toggle' | 'dropdown' | 'button'
    get: Optional[Callable[[], Any]] = None
    set: Optional[Callable[[Any], None]] = None   # for 'button': the action (takes no value)
    min: Optional[float] = None
    max: Optional[float] = None
    step: Optional[float] = None
    options: Optional[Sequence[Any]] = None       # for 'dropdown'
    help: str = ""


def _dirty(state: WispState):
    state.renderer.canvas_dirty = True


# -- camera panel (reference WidgetCameraProperties: fov / lens / pose editing) -------------
def camera_controls(app) -> List[Control]:
    """Edits the live RendererCore camera (reference camera properties panel)."""
    from wisp_tpu.core.camera import Camera

    core = app.render_core

    def set_fov(deg: float):
        cam = core.camera
        core.camera = Camera.from_args(view_matrix=cam.view_matrix, width=cam.width,
                                       height=cam.height, fov=float(np.radians(deg)),
                                       near=cam.near, far=cam.far, lens=cam.lens,
                                       fov_distance=cam.fov_distance)
        _dirty(app.wisp_state)

    def set_distance(d: float):
        cam = core.camera
        pos = np.asarray(cam.cam_pos).reshape(3)
        norm = float(np.linalg.norm(pos)) or 1.0
        core.camera = cam.translate(pos * (float(d) / norm - 1.0))
        _dirty(app.wisp_state)

    def set_lens(lens: str):
        cam = core.camera
        core.camera = Camera.from_args(view_matrix=cam.view_matrix, width=cam.width,
                                       height=cam.height, fov=cam.fov, near=cam.near,
                                       far=cam.far, lens=lens,
                                       fov_distance=cam.fov_distance)
        app.wisp_state.renderer.selected_camera_lens = lens
        _dirty(app.wisp_state)

    def set_mode(mode: str):
        app.user_mode = app._make_user_mode(mode)

    return [
        Control("FOV (deg)", "float", min=10.0, max=120.0, step=1.0,
                get=lambda: float(np.degrees(core.camera.fov or 0.5)), set=set_fov,
                help="horizontal field of view"),
        Control("Distance", "float", min=0.5, max=10.0, step=0.1,
                get=lambda: float(np.linalg.norm(core.camera.cam_pos)),
                set=set_distance, help="dolly the camera along its origin ray"),
        Control("Lens", "dropdown", options=["pinhole", "ortho"],
                get=lambda: core.camera.lens, set=set_lens),
        Control("Control mode", "dropdown",
                options=["turntable", "trackball", "first_person"],
                # registry key, not the class name — set_mode round-trips through
                # app._make_user_mode's {'turntable': TurntableMode, ...} mapping
                get=lambda: {"FirstPersonMode": "first_person",
                             "TrackballMode": "trackball",
                             "TurntableMode": "turntable"}.get(
                                 type(app.user_mode).__name__, "turntable"),
                set=set_mode),
    ]


# -- renderer settings panel (reference WidgetRendererProperties) ---------------------------
def render_settings_controls(state: WispState) -> List[Control]:
    r = state.renderer

    def set_channel(ch: str):
        r.selected_canvas_channel = ch   # watchedfields event fires here
        _dirty(state)

    def set_res(h: int):
        # preserve the canvas's current aspect ratio (square canvases stay square)
        aspect = (r.canvas_width / r.canvas_height) if r.canvas_height else 1.0
        r.canvas_height = int(h)
        r.canvas_width = max(1, int(round(int(h) * aspect)))
        _dirty(state)

    def set_fps(v: float):
        r.target_fps = float(v)

    return [
        Control("Channel", "dropdown",
                options=list(r.available_canvas_channels) or ["rgb"],
                get=lambda: r.selected_canvas_channel, set=set_channel,
                help="which RenderBuffer channel the canvas shows"),
        Control("Canvas height", "int", min=64, max=1080, step=16,
                get=lambda: r.canvas_height, set=set_res),
        Control("Target FPS", "float", min=1.0, max=60.0, step=1.0,
                get=lambda: float(r.target_fps or 24.0), set=set_fps,
                help="FPS-adaptive resolution target"),
    ]


# -- per-object tracer panel (reference per-tracer property editors) ------------------------
def tracer_controls(state: WispState, object_name: str) -> List[Control]:
    """Edit tracer properties of one scene object. Writes a ``.replace()``d pipeline back
    into the scene graph (pipelines are immutable pytrees)."""

    def pipeline():
        return state.graph.neural_pipelines[object_name]

    def update_tracer(**kw):
        pipe = pipeline()
        state.graph.neural_pipelines[object_name] = pipe.replace(
            tracer=pipe.tracer.replace(**kw))
        _dirty(state)

    controls = []
    tracer = pipeline().tracer
    if hasattr(tracer, "num_steps"):
        controls.append(Control(
            "Raymarch steps", "int", min=16, max=2048, step=16,
            get=lambda: pipeline().tracer.num_steps,
            set=lambda v: update_tracer(num_steps=int(v))))
    if hasattr(tracer, "raymarch_type"):
        controls.append(Control(
            "Raymarch type", "dropdown", options=["ray", "voxel", "uniform"],
            get=lambda: pipeline().tracer.raymarch_type,
            set=lambda v: update_tracer(raymarch_type=v)))
    if hasattr(tracer, "bg_color"):
        controls.append(Control(
            "Background", "dropdown", options=["black", "white"],
            get=lambda: "white" if sum(pipeline().tracer.bg_color) > 1.5 else "black",
            set=lambda v: update_tracer(
                bg_color=(1.0, 1.0, 1.0) if v == "white" else (0.0, 0.0, 0.0))))
    if hasattr(tracer, "early_stop"):
        controls.append(Control(
            "Early stop", "float", min=0.0, max=0.1, step=0.005,
            get=lambda: pipeline().tracer.early_stop,
            set=lambda v: update_tracer(early_stop=float(v)),
            help="transmittance early-termination threshold (0 = off)"))
    visible_flags = state.graph.visible_objects
    controls.append(Control(
        "Visible", "toggle",
        get=lambda: visible_flags.get(object_name, True),
        set=lambda v: (visible_flags.__setitem__(object_name, bool(v)), _dirty(state))))
    return controls


# -- optimization panel (reference WidgetOptimization's pause/controls) ---------------------
def optimization_controls(state: WispState, app=None) -> List[Control]:
    opt = state.optimization

    def set_running(v: bool):
        opt.running = bool(v)   # watchedfields event; OptimizationApp's tick obeys it

    controls = [
        Control("Training running", "toggle",
                get=lambda: opt.running, set=set_running,
                help="pause/resume the background training task"),
    ]
    if app is not None and hasattr(app, "toggle_training"):
        controls.append(Control("Toggle training", "button", set=lambda *_: app.toggle_training()))
    return controls


def all_panels(app) -> Dict[str, List[Control]]:
    """Every editable panel for an app: {panel title: [controls]} — the full editing
    surface a front-end should render (reference gui layout, wisp_app.py imgui docking)."""
    state = app.wisp_state
    panels = {
        "Camera": camera_controls(app),
        "Render settings": render_settings_controls(state),
        "Optimization": optimization_controls(state, app),
    }
    for name in state.graph.neural_pipelines:
        panels[f"Object: {name}"] = tracer_controls(state, name)
    return panels
