"""PackedSDFTracer — NGLOD sphere tracer.

Counterpart of reference wisp/tracers/packed_sdf_tracer.py:18-174. The reference's per-ray
two-phase loop (step by sdf·step_size inside occupied voxels, then a CUDA find_depth_bound to
skip across empty space) becomes a fixed-iteration ``lax.fori_loop`` over the whole ray batch
with per-ray masks: each iteration advances only alive rays, and rays leaving their current
occupied interval jump to the next interval's entry via a vectorized searchsorted over the
fixed-capacity raytrace buffers (find_depth_bound equivalent, csrc/render/
find_depth_bound_cuda.cu:16-45).

Outputs mirror the reference: xyz / depth / hit / normal (finite-difference gradient of the
field, reference :167-170) / rgb = (normal+1)/2 / alpha.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Set

import jax
import jax.numpy as jnp

from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.ops.differential import finitediff_gradient
from wisp_tpu.tracers.base_tracer import BaseTracer


class PackedSDFTracer(BaseTracer):
    def __init__(self, num_steps: int = 1024, step_size: float = 0.8,
                 min_dis: float = 0.0003, raytrace_capacity: Optional[int] = None):
        super().__init__()
        self.num_steps = num_steps
        self.step_size = step_size
        self.min_dis = min_dis
        # per-ray occupied-interval buffer cap; None = the blas's level-scaled exact
        # bound (octree_as.raytrace), an int pins the buffer (memory/speed trade)
        self.raytrace_capacity = raytrace_capacity

    def get_supported_channels(self) -> Set[str]:
        return {"depth", "normal", "xyz", "hit", "rgb", "alpha"}

    def get_required_nef_channels(self) -> Set[str]:
        return {"sdf"}

    def trace(self, nef, rays, channels, extra_channels, lod_idx=None,
              num_steps=64, step_size=1.0, min_dis=1e-4):
        if lod_idx is None:
            lod_idx = nef.grid.num_lods - 1
        level = nef.grid.active_lods[lod_idx] if hasattr(nef.grid, "active_lods") \
            else None

        # Ray/occupied-cell intervals at the traced level (sorted along the ray).
        # capacity only forwarded when pinned — custom grids (and the reference API) don't
        # all accept it; None means the blas's level-scaled default
        cap_kw = {} if self.raytrace_capacity is None \
            else {"capacity": self.raytrace_capacity}
        rt = nef.grid.raytrace(rays, level=level, with_exit=True, **cap_kw)
        t_entry, t_exit, imask = rt.t_entry, rt.t_exit, rt.mask      # [R, K]
        num_ints = jnp.sum(imask, axis=-1)                           # [R]
        has_any = num_ints > 0

        big = jnp.float32(1e10)
        exit_sorted = jnp.where(imask, t_exit, big)                  # padded exits -> +inf
        entry_sorted = jnp.where(imask, t_entry, big)

        def first_interval_from(t):
            """find_depth_bound: first interval whose exit lies beyond depth t → its entry
            (clamped below by t)."""
            beyond = exit_sorted > t[:, None]
            any_valid = jnp.any(beyond & imask, axis=-1)
            first = jnp.argmax(beyond & imask, axis=-1)
            entry = jnp.take_along_axis(entry_sorted, first[:, None], axis=-1)[:, 0]
            return jnp.maximum(entry, t), any_valid

        t0, valid0 = first_interval_from(jnp.zeros_like(t_entry[:, 0]))

        def sdf_at(t):
            pos = rays.origins + t[:, None] * rays.dirs
            return nef(channels="sdf", coords=pos, lod_idx=lod_idx)[:, 0], pos

        def body(i, carry):
            t, alive, hit = carry
            d, _ = sdf_at(t)
            hit_now = jnp.abs(d) < min_dis
            hit = hit | (alive & hit_now)
            alive = alive & ~hit_now

            t_candidate = t + d * step_size
            t_candidate = jnp.maximum(t_candidate, t)  # no backward steps out of the surface
            # If the candidate left the current occupied interval, skip to the next one.
            in_some = jnp.any((t_candidate[:, None] >= entry_sorted - 1e-6)
                              & (t_candidate[:, None] <= exit_sorted) & imask, axis=-1)
            t_skip, still_valid = first_interval_from(t_candidate)
            t_next = jnp.where(in_some, t_candidate, t_skip)
            alive = alive & jnp.where(in_some, True, still_valid)
            t = jnp.where(alive, t_next, t)
            return t, alive, hit

        t, alive, hit = jax.lax.fori_loop(
            0, num_steps, body,
            (t0, valid0, jnp.zeros_like(valid0)))

        _, xyz = sdf_at(t)
        # Normals: finite differences of the field at the hit points (reference :167-170).
        sdf_fn = lambda pts: nef(channels="sdf", coords=pts, lod_idx=lod_idx)
        grad = finitediff_gradient(xyz, sdf_fn)
        normal = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        normal = jnp.where(hit[:, None], normal, 0.0)

        rgb = jnp.where(hit[:, None], (normal + 1.0) / 2.0, 1.0)
        alpha = hit[:, None].astype(jnp.float32)
        depth = jnp.where(hit, t, 0.0)[:, None]

        extra_outputs = {}
        for channel in extra_channels:
            feats = nef(channels=channel, coords=xyz, lod_idx=lod_idx)
            extra_outputs[channel] = jnp.where(hit[:, None], feats, 0.0)

        # Surface interval-buffer saturation (fixed-capacity raytrace can drop occupied
        # intervals past the cap; the reference's unbounded nuggets cannot): scalar count of
        # overflowed rays, logged host-side by the offline renderer / trainers.
        num_overflow = jnp.sum(rt.overflow.astype(jnp.float32)) \
            if getattr(rt, "overflow", None) is not None else None
        return RenderBuffer(xyz=xyz, depth=depth, hit=hit[:, None], rgb=rgb, alpha=alpha,
                            normal=normal, num_overflow=num_overflow, **extra_outputs)

    def public_properties(self) -> Dict[str, Any]:
        return {"Num steps": self.num_steps, "Step size": self.step_size,
                "Min distance": self.min_dis}
