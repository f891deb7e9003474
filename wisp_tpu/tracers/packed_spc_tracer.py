"""PackedSPCTracer — first-hit voxel tracer for raw SPC rendering.

Counterpart of reference wisp/tracers/packed_spc_tracer.py:7-90: find the first intersected
occupied cell per ray, query the field's colors there. The reference raytraces the octree
into packed nuggets and takes each ray's first (mark_pack_boundaries + first-pidx); here the
first hit is found directly with the same free-space-distance walk PackedSDFTracer marches
with (``blas.free_space_distance()``, one occupancy gather per step, exact
voxel-boundary stepping near occupancy) — no serial DDA scan, no [R, capacity] interval
buffers, no interval overflow. The walk lands on the entry face of the first occupied cell,
so ``depth`` matches the DDA raytrace's ``t_entry`` to boundary-nudge precision
(equivalence-tested against ``grid.raytrace`` in tests/core/test_tracers_spc.py).

Rays whose walk is still in free space after ``num_steps`` iterations (pathological
surface-tangent crawls; the skip makes typical scenes resolve in ≪ num_steps) are counted
in ``num_overflow`` — the same non-silent contract as the other tracers' budgets.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Set

import jax
import jax.numpy as jnp

from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.ops.geometric import voxel_boundary_step
from wisp_tpu.ops.spc.core import quantize_points_jnp
from wisp_tpu.tracers.base_tracer import BaseTracer


class PackedSPCTracer(BaseTracer):
    def __init__(self, num_steps: int = 256, free_dist=None):
        super().__init__()
        self.num_steps = num_steps
        # optional cached free-space-distance field (SPC topology is static):
        # ``tracer.with_free_dist(blas)`` computes it once per scene
        self.free_dist = free_dist

    def with_free_dist(self, blas) -> "PackedSPCTracer":
        """Return a tracer with ``blas.free_space_distance()`` materialized (one jit
        call), so subsequent traces skip the per-call transform."""
        return self.replace(free_dist=jax.jit(blas.free_space_distance)())

    def get_supported_channels(self) -> Set[str]:
        return {"depth", "hit", "rgb", "alpha"}

    def get_required_nef_channels(self) -> Set[str]:
        return {"rgb"}

    def trace(self, nef, rays, channels, extra_channels, lod_idx=None,
              num_steps=256, free_dist=None):
        blas = nef.grid.blas
        res = 2 ** blas.max_level
        voxel = 2.0 / res
        if free_dist is None:                                        # [res^3] i32
            free_dist = blas.free_space_distance()

        t_near, t_far = type(blas).aabb_intersect(rays)
        t_near = jnp.maximum(t_near, 0.0) + 1e-6
        alive0 = t_far > t_near

        def walk_body(i, carry):
            t, alive = carry
            pos = rays.origins + t[:, None] * rays.dirs
            inside = jnp.all((pos >= -1.0) & (pos < 1.0), axis=-1)
            q = quantize_points_jnp(pos, blas.max_level)
            flat = (q[..., 0] * res + q[..., 1]) * res + q[..., 2]
            k = jnp.where(inside, free_dist[flat], jnp.int32(2 ** 30))
            advance = alive & (k > 0)
            skip = (k.astype(jnp.float32) - 1.0) * voxel
            step = jnp.maximum(skip, voxel_boundary_step(pos, rays.dirs, voxel))
            t = jnp.where(advance, t + step, t)
            alive = alive & (t <= t_far)
            return t, alive

        t, alive = jax.lax.fori_loop(0, num_steps, walk_body, (t_near, alive0))

        pos = rays.origins + t[:, None] * rays.dirs
        in_occ = blas.occupancy_at(pos)
        has_hit = alive & in_occ
        # unresolved walks (alive, in free space, budget spent) are counted, never silent
        num_overflow = jnp.sum((alive & ~in_occ).astype(jnp.float32))
        pidx = jnp.where(has_hit, blas.query(pos).pidx, -1)

        out = nef(channels=["rgb", "alpha"], pidx=pidx, coords=pos)
        rgb = out["rgb"]
        alpha = out["alpha"] * has_hit[:, None].astype(out["alpha"].dtype)
        depth = jnp.where(has_hit, t, 0.0)[:, None]
        return RenderBuffer(rgb=rgb, alpha=alpha, depth=depth, hit=has_hit[:, None],
                            num_overflow=num_overflow)

    def public_properties(self) -> Dict[str, Any]:
        return {"Num steps": self.num_steps}
