"""PackedSPCTracer TPU render throughput (first-hit SPC browsing, reference
wisp/tracers/packed_spc_tracer.py:7-90 / examples/spc_browser).

Benches first-hit voxel rendering at --side^2 on the spc_browser shape: a level-7
colored SPC from 1M surface samples of a procedural sphere, free-space-distance walk
with the field cached once per scene (``tracer.with_free_dist``). The walk cost is
content-independent (fori_loop runs its full budget), so a debug-colored sphere gives
the same wall as any browsed mesh.

Usage: python tools/spc_render_bench.py [--side 512] [--chunk 65536] [--steps 64]
Prints one JSON line. Timing hard-syncs by fetching a scalar (block_until_ready does
not synchronize on the axon remote platform); the first timed stage is a throwaway
warmup (first-timed-function readings run ~200 ms/call high on this platform).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=64,
                    help="free-space-walk iteration budget (walks still in free space "
                         "after this many steps are counted in num_overflow)")
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (logic checks only, not perf)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.core import Rays
    from wisp_tpu.models.nefs.spc_field import SPCField
    from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
    from wisp_tpu.ops.spc import pointcloud_to_octree
    from wisp_tpu.tracers import PackedSPCTracer

    v, f = make_sphere_mesh(radius=0.7, subdivisions=4)
    samples = sample_surface(v, f, 1_000_000)
    colors = (np.asarray(samples) + 1.0) / 2.0
    codes_per_level, cell_colors = pointcloud_to_octree(samples, args.level,
                                                        attributes=colors)
    blas = OctreeAS(codes_per_level)
    nef = SPCField(blas=blas, colors=cell_colors)
    tracer = PackedSPCTracer(num_steps=args.steps).with_free_dist(blas)

    side = args.side
    xs = np.linspace(-0.95, 0.95, side, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    origins = np.stack([xx.ravel(), yy.ravel(), np.full(side * side, -3.0, np.float32)],
                       axis=-1)
    dirs = np.zeros_like(origins)
    dirs[:, 2] = 1.0
    n_total = side * side
    chunk = min(args.chunk, n_total)

    trace_fn = jax.jit(lambda r: tracer(nef, r).channels)

    def rays_of(i):
        return Rays(jnp.asarray(origins[i:i + chunk]), jnp.asarray(dirs[i:i + chunk]),
                    0.0, 10.0)

    t0 = time.perf_counter()
    out = trace_fn(rays_of(0))
    _ = float(out["depth"].sum())
    compile_s = time.perf_counter() - t0

    # throwaway warmup stage (first timed function in a process reads high)
    for _ in range(3):
        _ = float(trace_fn(rays_of(0))["depth"].sum())

    t0 = time.perf_counter()
    acc = 0.0
    hits = 0.0
    overflow = 0.0
    for _ in range(args.iters):
        for i in range(0, n_total, chunk):
            out = trace_fn(rays_of(i))
            acc = acc + out["depth"].sum()
            hits = hits + out["hit"].sum()
            overflow = overflow + out["num_overflow"]
    _ = float(acc)
    frame_s = (time.perf_counter() - t0) / args.iters
    hits = float(hits) / args.iters
    overflow = float(overflow) / args.iters

    print(json.dumps({
        "metric": "spc_render_rays_per_sec",
        "value": round(n_total / frame_s, 1),
        "unit": "rays/s/chip",
        "ms_per_frame": round(frame_s * 1e3, 1),
        "fps": round(1.0 / frame_s, 2),
        "side": side, "chunk": chunk, "steps": args.steps, "level": args.level,
        "hit_frac": round(hits / n_total, 4),
        "overflow_rays_per_frame": int(overflow),
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
