"""Sphere-tracer TPU render throughput (VERDICT r2 #5 — previously unmeasured).

Benches PackedSDFTracer rendering at 512x512 on the NGLOD-octree config shape (level-7
blas from a procedural sphere, OctreeGrid 6 LODs x feature 16, hidden-128 NeuralSDF,
32 sphere-trace steps). Tracer cost is weight-independent (the fori_loops run all
iterations for every ray), so an untrained nef gives the same wall as a converged one
(hit_frac ~0 is expected); quality evidence lives in tests/apps/test_nglod.py.

Stage breakdown: the free-space-distance transform alone (the per-render-call
precompute, accelstructs/octree_as.py free_space_distance) vs the full trace
(FSD walk + num_steps sphere-trace iterations + finite-difference normals).

Usage: python tools/sdf_render_bench.py [--side 512] [--chunk 65536] [--steps 32]
Prints one JSON line. Timing hard-syncs by fetching a scalar (block_until_ready does not
synchronize on the axon remote platform).
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
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--compaction", type=float, default=None,
                    help="active-ray compaction budget fraction (sphere loop runs only "
                         "on rays that reached occupied space)")
    ap.add_argument("--mid-compaction", type=float, default=None,
                    help="mid-loop re-compaction budget fraction: after mid_at*steps "
                         "sphere iterations, only still-alive rays pay the remaining "
                         "nef queries (pays off on TRAINED fields where rays hit early)")
    ap.add_argument("--mid-at", type=float, default=0.5)
    ap.add_argument("--shuffle", action="store_true",
                    help="interleave rays across chunks (fixed permutation) so each "
                         "chunk sees the frame-average live fraction — lets a tight "
                         "compaction budget hold for every chunk")
    ap.add_argument("--pretrained", type=str, default=None,
                    help="path to a 'full'-format checkpoint (e.g. the nglod app's "
                         "model.pkl): bench the TRAINED field instead of the synthetic "
                         "untrained one — required for an honest mid-compaction number "
                         "(untrained fields never converge, so the live set never "
                         "shrinks)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (JAX_PLATFORMS=cpu alone is NOT "
                         "honored in ad-hoc scripts on this platform — logic checks "
                         "only, not perf)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.core import Rays
    from wisp_tpu.models.grids import OctreeGrid
    from wisp_tpu.models.nefs.neural_sdf import NeuralSDF
    from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
    from wisp_tpu.ops.spc.core import quantize_points
    from wisp_tpu.tracers.packed_sdf_tracer import PackedSDFTracer

    if args.pretrained:
        from wisp_tpu.trainers import load_pipeline
        pipeline = load_pipeline(args.pretrained)
        nef = pipeline.nef
        blas = nef.grid.blas
        args.level = int(blas.max_level)
    else:
        v, f = make_sphere_mesh(radius=0.7, subdivisions=4)
        samples = sample_surface(v, f, 1_000_000)
        blas = OctreeAS.from_quantized_points(quantize_points(samples, args.level),
                                              args.level)
        grid = OctreeGrid(blas=blas, feature_dim=16, num_lods=6, feature_std=0.01,
                          multiscale_type="sum", interpolation_type="linear",
                          key=jax.random.PRNGKey(0))
        nef = NeuralSDF(grid=grid, pos_embedder="none", position_input=True,
                        hidden_dim=128, num_layers=1, key=jax.random.PRNGKey(1))
    tracer = PackedSDFTracer(num_steps=args.steps, step_size=0.8, min_dis=3e-4,
                             compaction=args.compaction,
                             mid_compaction=args.mid_compaction, mid_at=args.mid_at)
    tracer = tracer.with_free_dist(blas)  # scene-static: transform computed once

    # pinhole-ish ray grid from z=-3
    side = args.side
    xs = np.linspace(-0.95, 0.95, side, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    origins = np.stack([xx.ravel(), yy.ravel(), np.full(side * side, -3.0, np.float32)],
                       axis=-1)
    dirs = np.zeros_like(origins)
    dirs[:, 2] = 1.0
    n_total = side * side
    chunk = min(args.chunk, n_total)
    if args.shuffle:
        perm = np.random.default_rng(0).permutation(n_total)
        origins, dirs = origins[perm], dirs[perm]

    trace_fn = jax.jit(lambda r: tracer(nef, r).channels)
    fsd_fn = jax.jit(lambda: blas.free_space_distance().sum())

    def rays_of(i):
        return Rays(jnp.asarray(origins[i:i + chunk]), jnp.asarray(dirs[i:i + chunk]),
                    0.0, 10.0)

    # compile
    t0 = time.perf_counter()
    out = trace_fn(rays_of(0))
    _ = float(out["depth"].sum())
    compile_s = time.perf_counter() - t0
    _ = float(fsd_fn())

    # FSD transform alone (recomputed once per trace call today)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(args.iters):
        acc = acc + fsd_fn()
    _ = float(acc)
    fsd_s = (time.perf_counter() - t0) / args.iters

    # full trace
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
    full_s = (time.perf_counter() - t0) / args.iters

    result = {
        "metric": "sdf_render_rays_per_sec_per_chip",
        "value": round(n_total / full_s, 1),
        "unit": "rays/s",
        "detail": {
            "side": side, "chunk": chunk, "num_steps": args.steps,
            "level": args.level, "iters": args.iters,
            "full_ms_per_frame": round(full_s * 1e3, 1),
            "fps": round(1.0 / full_s, 2),
            "fsd_transform_ms": round(fsd_s * 1e3, 2),
            "hit_frac": round(float(hits) / (args.iters * n_total), 4),
            "compaction": args.compaction, "shuffle": args.shuffle,
            "mid_compaction": args.mid_compaction, "mid_at": args.mid_at,
            "pretrained": bool(args.pretrained),
            "overflow_rays_per_frame": round(float(overflow) / args.iters, 1),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
