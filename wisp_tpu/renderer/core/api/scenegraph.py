"""Scene-graph manipulation helpers (reference wisp/renderer/core/api/scenegraph.py:16-107)."""

from __future__ import annotations

from typing import Optional

from wisp_tpu.framework.state import WispState


def add_to_scene_graph(state: WispState, name: str, obj, transform=None,
                       batch_size: Optional[int] = None) -> None:
    """Register a pipeline (or camera) in the shared scene graph; visualizers pick it up on
    their next refresh (reference scenegraph.py:16-64)."""
    from wisp_tpu.core.camera import Camera
    if isinstance(obj, Camera):
        state.graph.cameras[name] = obj
        return
    state.graph.neural_pipelines[name] = obj
    state.graph.visible_objects.setdefault(name, True)


def remove_from_scene_graph(state: WispState, name: str) -> None:
    """(reference scenegraph.py:67-89)"""
    state.graph.neural_pipelines.pop(name, None)
    state.graph.bl_renderers.pop(name, None)
    state.graph.visible_objects.pop(name, None)
    state.graph.cameras.pop(name, None)


def request_redraw(state: WispState) -> None:
    """Mark the canvas dirty (reference scenegraph.py:92-107)."""
    state.renderer.canvas_dirty = True
