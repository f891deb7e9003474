"""Renderer factory (reference wisp/renderer/core/api/renderers_factory.py:25-139): walk the
MRO of a pipeline's (nef, tracer) pair to find the best-matching registered
BottomLevelRenderer, defaulting to RayTracedRenderer."""

from __future__ import annotations

from typing import Optional

from wisp_tpu.renderer.core.api.base_renderer import BottomLevelRenderer, RayTracedRenderer
from wisp_tpu.renderer.core.api.decorators import registered_renderers


def create_neural_field_renderer(pipeline, **kwargs) -> BottomLevelRenderer:
    """Best-match renderer by MRO walk over (type(nef), type(tracer))
    (reference renderers_factory.py:121-139)."""
    registry = registered_renderers()
    nef = getattr(pipeline, "nef", None)
    tracer = getattr(pipeline, "tracer", None)
    if nef is not None and tracer is not None:
        for nef_cls in type(nef).__mro__:
            for tracer_cls in type(tracer).__mro__:
                renderer_cls = registry.get((nef_cls, tracer_cls))
                if renderer_cls is not None:
                    return renderer_cls(pipeline, **kwargs)
    return RayTracedRenderer(pipeline, **kwargs)
