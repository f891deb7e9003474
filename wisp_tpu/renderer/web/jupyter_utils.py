"""Jupyter live canvas (reference wisp/renderer/web/jupyter_utils.py:23-156+): ipycanvas +
ipyevents front-end for interactive viewing inside notebooks — the natural interactive
surface for TPU pods (no display / GL). Gated on the optional ipycanvas/ipyevents deps like
the reference gates its interactive imports."""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


def is_interactive() -> bool:
    """True when running inside a jupyter kernel with ipycanvas available."""
    try:
        import ipycanvas  # noqa: F401
        from IPython import get_ipython
        return get_ipython() is not None
    except ImportError:
        return False


class JupyterPresenter:
    """FramePresenter streaming frames into an ipycanvas widget, with mouse/keyboard events
    bound back to the app's camera controller (reference jupyter_utils.py event binding)."""

    def __init__(self, app, width: int = 512, height: int = 512, downscale: int = 1):
        import ipycanvas
        from ipyevents import Event
        self.app = app
        self.canvas = ipycanvas.Canvas(width=width, height=height)
        self.downscale = downscale
        self._drag_origin = None

        events = Event(source=self.canvas,
                       watched_events=["mousedown", "mouseup", "mousemove", "wheel",
                                       "keydown"])
        events.on_dom_event(self._handle_event)

    def _handle_event(self, event) -> None:
        etype = event.get("type")
        if etype == "mousedown":
            self._drag_origin = (event["relativeX"], event["relativeY"])
        elif etype == "mouseup":
            self._drag_origin = None
        elif etype == "mousemove" and self._drag_origin is not None:
            x, y = event["relativeX"], event["relativeY"]
            dx, dy = x - self._drag_origin[0], y - self._drag_origin[1]
            self._drag_origin = (x, y)
            self.app.on_mouse_drag(dx, dy)
        elif etype == "wheel":
            self.app.on_mouse_scroll(-np.sign(event.get("deltaY", 0.0)))
        elif etype == "keydown":
            self.app.on_key(event.get("key", ""))

    def present(self, frame: np.ndarray, step: int) -> None:
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if self.downscale > 1:
            arr = arr[::self.downscale, ::self.downscale]
        self.canvas.put_image_data(arr, 0, 0)

    def display(self):
        from IPython.display import display
        display(self.canvas)


def live_canvas(app, width: int = 512, height: int = 512) -> Optional[JupyterPresenter]:
    """Attach a live canvas to a WispApp when running in a notebook; returns None (with a
    warning) outside jupyter."""
    if not is_interactive():
        log.warning("ipycanvas/jupyter not available; use DiskPresenter for headless runs")
        return None
    presenter = JupyterPresenter(app, width, height)
    app.presenter = presenter
    presenter.display()
    return presenter
