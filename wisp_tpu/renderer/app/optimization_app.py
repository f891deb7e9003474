"""OptimizationApp — interactive training app.

Counterpart of reference wisp/renderer/app/optimization_app.py:23-116: registers
trainer.iterate as the idle-tick background task, re-renders when the optimization state
changes, and supports pause/resume (the reference binds SPACE; front-ends call
``toggle_training``)."""

from __future__ import annotations

from typing import Callable, Optional

from wisp_tpu.framework.event import watch
from wisp_tpu.framework.state import WispState
from wisp_tpu.renderer.app.wisp_app import FramePresenter, WispApp


class OptimizationApp(WispApp):
    def __init__(self, wisp_state: WispState, trainer_step_func: Callable,
                 experiment_name: str = "optimization",
                 presenter: Optional[FramePresenter] = None):
        super().__init__(wisp_state, window_name=experiment_name, presenter=presenter)
        self.trainer_step_func = trainer_step_func
        self.register_background_task(self._training_tick)
        # redraw on epoch change (reference optimization_app.py:70-81 via watched fields)
        watch(wisp_state.optimization, "epoch", handler=self._on_epoch_ended)

    def _training_tick(self) -> None:
        if self.wisp_state.optimization.running:
            self.trainer_step_func()

    def _on_epoch_ended(self, value) -> None:
        self.wisp_state.renderer.canvas_dirty = True

    def toggle_training(self) -> None:
        """(reference optimization_app.py:105-110 binds this to SPACE)"""
        self.wisp_state.optimization.running = not self.wisp_state.optimization.running

    def on_key(self, key: str) -> None:
        if key == " ":
            self.toggle_training()

    def run(self, max_iterations: Optional[int] = None, render_every: int = 25) -> None:
        self.wisp_state.optimization.running = True
        super().run(max_iterations=max_iterations, render_every=render_every)
