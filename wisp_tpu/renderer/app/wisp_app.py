"""WispApp — interactive application shell.

Counterpart of reference wisp/renderer/app/wisp_app.py:40-769, redesigned for TPU pods:
the reference couples glumpy/GLFW/imgui with CUDA-GL interop — none of which exists in a
headless TPU environment. Here the app drives the same loop (background tasks → render →
present) over pluggable *presenters*: a frame-to-disk presenter for headless runs, and the
jupyter/ipycanvas presenter (wisp_tpu/renderer/web) when a notebook front-end is attached.
The event-handler surface (mouse/keyboard → camera controller) is preserved so front-ends
can forward input events.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, List, Optional

import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.framework.state import WispState
from wisp_tpu.renderer.core.control.camera_controllers import (CameraControlMode,
                                                               FirstPersonMode,
                                                               TrackballMode,
                                                               TurntableMode)
from wisp_tpu.renderer.core.render_core import RendererCore

log = logging.getLogger(__name__)


class FramePresenter:
    """Where rendered frames go (the reference blits to a GL billboard via CUDA-GL,
    wisp_app.py:425+; on TPU frames are fetched to host and handed to a presenter)."""

    def present(self, frame: np.ndarray, step: int) -> None:
        raise NotImplementedError


class DiskPresenter(FramePresenter):
    def __init__(self, out_dir: str = "_results/frames"):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def present(self, frame: np.ndarray, step: int) -> None:
        from wisp_tpu.ops.image.io import write_png
        write_png(os.path.join(self.out_dir, f"frame_{step:06d}.png"), frame)


class WispApp:
    """Application shell: owns the WispState, RendererCore, camera controller, background
    tasks, and the render loop. Subclasses override the same hooks as the reference
    (init_wisp_state / create_widgets / create_gizmos / default_user_mode /
    register_event_handlers)."""

    def __init__(self, wisp_state: WispState, window_name: str = "wisp-tpu",
                 presenter: Optional[FramePresenter] = None):
        self.wisp_state = wisp_state
        self.window_name = window_name
        self.init_wisp_state(wisp_state)
        self.render_core = RendererCore(wisp_state)
        self.presenter = presenter or DiskPresenter()
        self.user_mode: CameraControlMode = self._make_user_mode(self.default_user_mode())
        self._background_tasks: List[Callable] = []
        self._frame_idx = 0
        self._last_render_time = 0.0
        self.gizmos = {}  # name -> painter with .paint(frame, camera)
        self.register_event_handlers()
        self.create_widgets()
        self.create_gizmos()

    # -- subclass hooks (reference wisp_app.py abstract surface) --------------------------------
    def init_wisp_state(self, wisp_state: WispState) -> None:
        pass

    def create_widgets(self) -> None:
        pass

    def create_gizmos(self) -> None:
        pass

    def default_user_mode(self) -> str:
        return "turntable"

    def register_event_handlers(self) -> None:
        pass

    # -- input routing (reference wisp_app.py:612-743) ------------------------------------------
    def _make_user_mode(self, name: str) -> CameraControlMode:
        modes = {"first_person": FirstPersonMode, "trackball": TrackballMode,
                 "turntable": TurntableMode}
        return modes[name](self.render_core.camera)

    def _sync_user_mode(self) -> None:
        # GUI controls replace render_core.camera directly (controls.py set_fov etc.);
        # rebase the controller so the next drag doesn't revert those edits
        if self.user_mode.camera is not self.render_core.camera:
            self.user_mode.rebase(self.render_core.camera)

    def on_mouse_drag(self, dx: float, dy: float) -> None:
        self._sync_user_mode()
        self.render_core.camera = self.user_mode.handle_mouse_drag(dx, dy)
        self.wisp_state.renderer.canvas_dirty = True

    def on_mouse_scroll(self, amount: float) -> None:
        self._sync_user_mode()
        self.render_core.camera = self.user_mode.handle_mouse_scroll(amount)
        self.wisp_state.renderer.canvas_dirty = True

    def on_key(self, key: str) -> None:
        pass

    # -- background tasks (reference wisp_app.py:540-549) ----------------------------------------
    def register_background_task(self, fn: Callable) -> None:
        self._background_tasks.append(fn)

    def _run_background_tasks(self) -> None:
        for fn in self._background_tasks:
            fn()

    # -- render loop (reference wisp_app.py:257-267, 483-564) ------------------------------------
    def render(self) -> np.ndarray:
        t0 = time.time()
        self.render_core.redraw()
        rb = self.render_core.render(time_delta=t0 - self._last_render_time)
        frame = self.render_core.map_output_channels_to_rgba(rb)
        # gizmo overlays painted after the canvas (reference wisp_app.py:483-538 draws
        # gizmos after the CUDA-GL blit)
        camera = self.render_core.camera.resize(frame.shape[1], frame.shape[0])
        for gizmo in self.gizmos.values():
            frame = gizmo.paint(frame, camera)
        dt = time.time() - t0
        self.wisp_state.renderer.dt = dt
        self.wisp_state.renderer.fps = 1.0 / max(dt, 1e-6)
        self._last_render_time = t0
        return frame

    def run(self, max_iterations: Optional[int] = None,
            render_every: int = 1) -> None:
        """Main loop: idle-tick background tasks, render at the requested cadence
        (reference glumpy event loop, wisp_app.py:257-267 + on_idle/on_draw)."""
        it = 0
        while True:
            self._run_background_tasks()
            if render_every > 0 and it % render_every == 0:
                frame = self.render()
                self.presenter.present(frame, self._frame_idx)
                self._frame_idx += 1
            it += 1
            if max_iterations is not None and it >= max_iterations:
                break
            if not self._background_tasks and max_iterations is None:
                break  # nothing to animate; single-shot render
