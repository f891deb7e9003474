"""Pipeline — (neural field, tracer) pair, the atomic renderable unit.

Counterpart of reference wisp/models/pipeline.py:14-87. ``pipeline(rays, channels=...)``
routes through the tracer when present, else calls the bare neural field.
``RasterizationPipeline`` wraps arbitrary rasterizer callables
(reference rasterization_pipeline.py:12-34).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from wisp_tpu.core.module import Module


class Pipeline(Module):
    def __init__(self, nef, tracer=None):
        self.nef = nef
        self.tracer = tracer

    def forward(self, *args, **kwargs):
        if self.tracer is not None:
            return self.tracer(self.nef, *args, **kwargs)
        return self.nef(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def public_properties(self) -> Dict[str, Any]:
        return {
            "Neural Field": self.nef.name() if self.nef is not None else None,
            "Tracer": self.tracer.name() if self.tracer is not None else None,
        }


class RasterizationPipeline(Module):
    """Wrapper for pipelines using rasterization rather than ray tracing
    (reference rasterization_pipeline.py:12-34); the wrapped callable receives all args."""

    def __init__(self, rasterizer):
        self.rasterizer = rasterizer

    def __call__(self, *args, **kwargs):
        return self.rasterizer(*args, **kwargs)

    def public_properties(self) -> Dict[str, Any]:
        return {"Rasterizer": type(self.rasterizer).__name__}
