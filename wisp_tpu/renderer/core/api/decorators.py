"""Field-renderer registry (reference wisp/renderer/core/api/decorators.py:~15-37):
``@field_renderer(FieldCls, TracerCls)`` registers which BottomLevelRenderer handles a
(neural field, tracer) combination."""

from __future__ import annotations

from typing import Dict, Tuple, Type

_RENDERERS_REGISTRY: Dict[Tuple[type, type], type] = {}


def field_renderer(field_type: type, tracer_type: type):
    """Class decorator registering a renderer for (field, tracer)."""
    def wrap(renderer_cls):
        _RENDERERS_REGISTRY[(field_type, tracer_type)] = renderer_cls
        return renderer_cls
    return wrap


def registered_renderers() -> Dict[Tuple[type, type], type]:
    return dict(_RENDERERS_REGISTRY)
