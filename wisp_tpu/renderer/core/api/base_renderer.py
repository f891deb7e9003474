"""Bottom-level renderer API (reference wisp/renderer/core/api/base_renderer.py:~20-115 and
raytraced_renderer.py:24-164).

A BottomLevelRenderer knows how to render one scene-graph object into a RenderBuffer for a
FramePayload; RayTracedRenderer is the default implementation wrapping a (nef, tracer)
pipeline with batched tracing and interactive-quality knobs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.primitives import PrimitivesPack
from wisp_tpu.core.rays import Rays
from wisp_tpu.core.render_buffer import RenderBuffer


@dataclasses.dataclass
class FramePayload:
    """Per-frame render request (reference base_renderer.py FramePayload)."""
    camera: Camera
    render_res_x: int
    render_res_y: int
    time_delta: float = 0.0
    visible_objects: Dict[str, bool] = dataclasses.field(default_factory=dict)
    channels: Tuple[str, ...] = ("rgb", "alpha", "depth")
    interactive_mode: bool = False


class BottomLevelRenderer:
    def __init__(self, pipeline, **kwargs):
        self.pipeline = pipeline
        self._data_layers: Dict[str, PrimitivesPack] = {}

    def pre_render(self, payload: FramePayload) -> None:
        pass

    def render(self, rays: Rays) -> RenderBuffer:
        raise NotImplementedError

    def post_render(self) -> None:
        pass

    def data_layers(self) -> Dict[str, PrimitivesPack]:
        return self._data_layers

    def regenerate_data_layers(self) -> Dict[str, PrimitivesPack]:
        return {}

    @property
    def model_matrix(self):
        return None

    def acceleration_structure(self) -> Optional[str]:
        return None

    def needs_refresh(self, *args) -> bool:
        return False


class RayTracedRenderer(BottomLevelRenderer):
    """Default renderer for neural pipelines: batched jitted trace at possibly reduced
    interactive quality (reference raytraced_renderer.py:24-164 deep-copies the tracer and
    tunes steps; here render-time kwargs override the tracer defaults)."""

    def __init__(self, pipeline, batch_size: int = 2 ** 16, **tracer_overrides):
        super().__init__(pipeline)
        self.batch_size = batch_size
        self.tracer_overrides = tracer_overrides
        self._infer = None

    # minimum padded chunk: chunks are padded UP to a power-of-two bucket so every canvas
    # resolution reuses a handful of compiled shapes (each unique ray-count shape costs a
    # fresh ~30 s XLA compile over the remote-TPU tunnel — round-3 interactive finding)
    MIN_CHUNK_BUCKET = 4096

    def render(self, rays: Rays) -> RenderBuffer:
        if self._infer is None:
            overrides = dict(self.tracer_overrides)

            def _run(pipeline, r):
                return pipeline(rays=r, **overrides)
            self._infer = jax.jit(_run)
        outs = []
        n = rays.origins.shape[0]
        step = self.batch_size if self.batch_size > 0 else n
        for i in range(0, n, step):
            r = rays[i:i + step]
            m = r.origins.shape[0]
            bucket = min(step, max(self.MIN_CHUNK_BUCKET,
                                   int(2 ** np.ceil(np.log2(max(m, 1))))))
            if m < bucket:
                pad = bucket - m
                r = Rays(jnp.concatenate([r.origins, jnp.zeros((pad, 3),
                                                               r.origins.dtype)]),
                         jnp.concatenate([r.dirs, jnp.ones((pad, 3), r.dirs.dtype)]),
                         r.dist_min, r.dist_max)
            out = jax.device_get(self._infer(self.pipeline, r))
            outs.append(out[:m] if m < bucket else out)
        return RenderBuffer.cat(outs) if len(outs) > 1 else outs[0]

    def warm_shapes(self) -> List[int]:
        """All ray-count shapes this renderer can ever compile (the po2 bucket ladder
        from MIN_CHUNK_BUCKET to batch_size) — the precompile target set."""
        shapes, b = [], self.MIN_CHUNK_BUCKET
        while b < self.batch_size:
            shapes.append(b)
            b *= 2
        shapes.append(self.batch_size)
        return shapes
