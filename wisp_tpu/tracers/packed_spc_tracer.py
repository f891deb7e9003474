"""PackedSPCTracer — first-hit voxel tracer for raw SPC rendering.

Counterpart of reference wisp/tracers/packed_spc_tracer.py:7-90: raytrace → take the first
intersected cell per ray (the reference's mark_pack_boundaries + first-pidx extraction is a
plain argmax over the interval mask in the fixed-capacity layout) → query the field's colors
at the hit cells.
"""

from __future__ import annotations

from typing import Any, Dict, Set

import jax.numpy as jnp

from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.tracers.base_tracer import BaseTracer


class PackedSPCTracer(BaseTracer):
    def __init__(self):
        super().__init__()

    def get_supported_channels(self) -> Set[str]:
        return {"depth", "hit", "rgb", "alpha"}

    def get_required_nef_channels(self) -> Set[str]:
        return {"rgb"}

    def trace(self, nef, rays, channels, extra_channels, lod_idx=None):
        rt = nef.grid.raytrace(rays)
        # first valid interval per ray (intervals are emitted sorted along the ray)
        has_hit = jnp.any(rt.mask, axis=-1)
        first = jnp.argmax(rt.mask, axis=-1)
        pidx = jnp.take_along_axis(rt.pidx, first[:, None], axis=-1)[:, 0]
        t_hit = jnp.take_along_axis(rt.t_entry, first[:, None], axis=-1)[:, 0]
        pidx = jnp.where(has_hit, pidx, -1)

        out = nef(channels=["rgb", "alpha"], pidx=pidx,
                  coords=rays.origins + t_hit[:, None] * rays.dirs)
        rgb = out["rgb"]
        alpha = out["alpha"] * has_hit[:, None].astype(out["alpha"].dtype)
        depth = jnp.where(has_hit, t_hit, 0.0)[:, None]
        # overflow can only drop intervals BEHIND the first hit for this tracer, but surface
        # it anyway for uniformity (see octree_as.raytrace capacity note)
        num_overflow = jnp.sum(rt.overflow.astype(jnp.float32)) \
            if getattr(rt, "overflow", None) is not None else None
        return RenderBuffer(rgb=rgb, alpha=alpha, depth=depth, hit=has_hit[:, None],
                            num_overflow=num_overflow)

    def public_properties(self) -> Dict[str, Any]:
        return {}
