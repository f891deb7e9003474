"""PackedRFTracer — differentiable volumetric radiance-field renderer.

Counterpart of reference wisp/tracers/packed_rf_tracer.py:17-183. The reference operates on
packed variable-length sample streams with segmented CUDA scans (kaolin
exponential_integration / sum_reduce); here samples live in a rectangular masked grid [R, S]
so the whole march → interpolate → decode → integrate chain is dense tensor math that XLA
fuses into one program (SURVEY.md §7):

* transmittance: tau = sigma·delta·mask, T_i = exp(-cumsum_exclusive(tau)) (the packed
  'exclusive' exponential integration), weight_i = T_i · (1 - exp(-tau_i)).
* rgb = bg·(1-alpha) + sum_i w_i·c_i;  depth = sum_i w_i·t_i;  alpha = sum_i w_i;
  hit = alpha > 0 — exactly the reference's outputs (packed_rf_tracer.py:137-165).
* extra channels are volumetrically integrated then scaled by alpha
  (packed_rf_tracer.py:167-179). Unlike the reference (which re-invokes the nef per extra
  channel), all requested channels are fetched in ONE nef call riding the same compaction
  budget — a single grid interpolation per trace.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.tracers.base_tracer import BaseTracer


class PackedRFTracer(BaseTracer):
    def __init__(self,
                 raymarch_type: str = "ray",
                 num_steps: int = 1024,
                 step_size: float = 1.0,
                 bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                 compaction: float = 0.0,
                 early_stop: float = 0.0,
                 lod_spacing_scale: float = 0.0,
                 march_budget: int = 1024,
                 march_stride: int = 1,
                 seg_early_stop: float = 0.0,
                 seg_count: int = 4):
        super().__init__(bg_color=bg_color)
        self.raymarch_type = raymarch_type
        self.num_steps = num_steps
        self.step_size = step_size
        self.compaction = compaction
        # Segmented TRUE-transmittance early termination (round 5, the unbiased
        # TRAINING-admissible cull designed in perf_playbook.md): decode the march in
        # `seg_count` depth segments carrying the EXACT accumulated optical depth of
        # already-decoded samples between them; samples on rays whose true transmittance
        # fell below `seg_early_stop` are culled before interpolation/decoding. Unlike
        # the cell-peak tau_hat estimate (`early_stop`, the erosion root cause —
        # results_round5.md), the cull criterion here is the ray's own decoded optical
        # depth — the same rule the compositor applies — so a truly-visible sample can
        # never be culled; dropped samples have weight < seg_early_stop. 0 = off.
        self.seg_early_stop = seg_early_stop
        self.seg_count = seg_count
        # voxel-mode per-ray fine-sample cap: the marcher keeps the first
        # march_budget//num_steps occupied voxels per ray (reference semantics: ALL
        # intersected voxels; far voxels past the cap are usually occluded)
        self.march_budget = march_budget
        # Transmittance early termination (instant-ngp-style): samples whose estimated
        # transmittance (from the blas's per-cell density EMA, refreshed at each prune)
        # falls below this threshold are culled BEFORE interpolation/decoding. 0 = off.
        # The estimate is exact 0 until the first prune, so early training is unaffected.
        self.early_stop = early_stop
        # Strided occupancy march ('ray'/'uniform' modes): gather occupancy every
        # march_stride samples and OR-broadcast between (OctreeAS._sample_grid). The
        # march gather is ~26% of the step at the flagship shape and sample spacing is
        # ~2.3x finer than a level-7 voxel, so stride 2 halves that index count with a
        # conservative-superset mask. 1 = exact per-sample test. PSNR-gated
        # (tests/apps/test_nerf.py::test_nerf_fast_path_quality).
        self.march_stride = march_stride
        # Spacing-based LOD truncation (cone-scaled LOD selection a la instant-ngp/mip
        # schemes): skip grid LODs whose cell size is smaller than lod_spacing_scale x the
        # coarsest sampling step (2*sqrt(3)/num_steps, the AABB-diagonal bound — exact for
        # 'uniform' marching, an upper bound for 'ray'). Sub-step cells alias rather than
        # resolve detail; skipping them cuts the most expensive hash-LOD gathers. 0 = off.
        self.lod_spacing_scale = lod_spacing_scale
        self.prev_num_samples = None  # host-side counter for adaptive ray batching

    def get_prev_num_samples(self) -> Optional[int]:
        """Valid-sample count of the last trace (reference packed_rf_tracer.py:56-66);
        feeds MultiviewTrainer.calc_adaptive_rays."""
        return self.prev_num_samples

    def get_supported_channels(self) -> Set[str]:
        return {"depth", "hit", "rgb", "alpha"}

    def get_required_nef_channels(self) -> Set[str]:
        return {"rgb", "density"}

    def trace(self, nef, rays, channels, extra_channels,
              lod_idx=None, raymarch_type="voxel", num_steps=64, step_size=1.0,
              bg_color=(1.0, 1.0, 1.0), key=None, compaction=None, early_stop=None,
              lod_spacing_scale=None, march_budget=None, march_stride=None,
              seg_early_stop=None, seg_count=None,
              density_feedback=False):
        assert nef.grid is not None, "this tracer requires a grid"
        n = rays.origins.shape[0]
        if lod_idx is None:
            lod_idx = nef.grid.num_lods - 1

        # Host-side (static) LOD truncation by sample spacing: keep LODs whose cell size
        # 2/res is at least lod_spacing_scale x the coarsest step. None -> all LODs.
        max_compute_lod = None
        if lod_spacing_scale and lod_spacing_scale > 0.0 \
                and hasattr(nef.grid, "resolutions"):
            if raymarch_type == "voxel":
                # voxel mode: num_steps samples per blas voxel -> spacing is
                # voxel_size/num_steps, NOT span/num_steps (using the ray formula here
                # would truncate every LOD at the reference's num_steps=16)
                blas_level = getattr(getattr(nef.grid, "blas", None), "max_level", None)
                if blas_level is None:
                    delta_est = None
                else:
                    delta_est = (2.0 / (2 ** blas_level)) / num_steps
            else:
                delta_est = 2.0 * float(np.sqrt(3)) / num_steps
            if delta_est is not None:
                res_cap = 2.0 / (float(lod_spacing_scale) * delta_est)
                keep = [i for i, r in enumerate(nef.grid.resolutions) if r <= res_cap]
                max_compute_lod = max(keep) if keep else 0

        march_kw = {"budget": march_budget} if (march_budget and
                                               raymarch_type == "voxel") else {}
        if raymarch_type == "voxel" and early_stop and early_stop > 0.0:
            # coarse-phase transmittance cull (octree_as._raymarch_voxel): occluded
            # occupied voxels stop consuming per-ray capacity, so march_budget can honestly
            # shrink to the VISIBLE voxel count — the slot-proportional costs (compaction
            # search, scatter-back) scale with budget. Dropped visible voxels are counted
            # in the num_overflow channel, never silent.
            # CAUTION (round 5): like the ray-mode tau_hat cull below, this estimates
            # optical thickness from the CELL-PEAK density and is a RENDER/BENCH lever
            # only — long-horizon TRAINING with pruning erodes under it (grazing-ray
            # wrong-culls, results_round5.md; _probe_graze_cull.py).
            march_kw["early_stop"] = float(early_stop)
        if march_stride and march_stride > 1 and raymarch_type in ("ray", "uniform"):
            march_kw["stride"] = int(march_stride)
        mr = nef.grid.raymarch(rays, raymarch_type=raymarch_type, num_samples=num_steps,
                               level=None, key=key, **march_kw)
        samples = mr.samples                       # [R, S, 3]
        deltas = jnp.broadcast_to(mr.deltas, mr.depth_samples.shape)  # [R, S]
        depths = mr.depth_samples                  # [R, S]
        mask = mr.mask                             # [R, S]
        if early_stop and early_stop > 0.0 and mr.cell_density is not None:
            # Transmittance early termination (instant-ngp RENDER loop semantics).
            # RENDER/BENCH lever ONLY — do not train long-horizon with this on: tau_hat
            # charges every sample the CELL-PEAK density, so once the field sharpens
            # into sub-voxel shells, grazing rays lose truly-visible samples (measured
            # 12.3% of hit rays lose >10% of visible weight, _probe_graze_cull.py);
            # those samples get no gradient and no prune feedback and the field erodes
            # one wave per prune (the round-4/5 erosion root cause, results_round5.md).
            # Estimate per-sample transmittance from the blas's density EMA
            # (free — it rode the occupancy gather) and cull samples the ray can no longer
            # see. Culled samples skip interpolation+decoding via the compaction budget.
            tau_hat = mr.cell_density * deltas * mask.astype(jnp.float32)
            t_hat = jnp.exp(-(jnp.cumsum(tau_hat, axis=-1) - tau_hat))
            mask = mask & (t_hat > early_stop)
        s = samples.shape[1]

        # One nef invocation covers rgb+density AND every extra channel (reference
        # packed_rf_tracer.py:167-179 re-queries per channel; here channel dispatch batches
        # them so extra channels ride the same grid interpolation + compaction budget).
        req_channels = ["rgb", "density", *extra_channels]

        seg_on = seg_early_stop and seg_early_stop > 0.0 and seg_count \
            and int(seg_count) > 1
        if seg_on:
            if early_stop and early_stop > 0.0:
                raise ValueError(
                    "seg_early_stop (unbiased segmented training cull) and early_stop "
                    "(cell-peak tau_hat render lever) are mutually exclusive — the "
                    "tau_hat estimate is the erosion root cause (results_round5.md)")
            if not (compaction and compaction > 0.0):
                raise ValueError("seg_early_stop requires compaction > 0 (the cull's "
                                 "savings are realized through the compaction budget)")
            return self._trace_segmented(
                nef, rays, channels, extra_channels, req_channels, lod_idx,
                max_compute_lod, mr, samples, deltas, depths, mask, n,
                float(compaction), float(seg_early_stop), int(seg_count), bg_color,
                density_feedback)

        flat = samples.reshape(n * s, 3)
        ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (n, s, 3)).reshape(n * s, 3)
        if compaction and compaction > 0.0:
            # Sample compaction: the fixed-shape analog of the reference's packed-sample
            # culling (octree_as.py fast_filter_method, :21-34) — only occupied samples pay
            # for interpolation + decoding. Valid samples gather into a static budget B;
            # results scatter back with out-of-bounds drop semantics for the padding.
            budget = int(np.ceil(n * s * float(compaction) / 128.0)) * 128
            budget = min(budget, n * s)
            from wisp_tpu.ops.compaction import masked_compact_indices
            # Compaction runs in STEP-major order (mask transposed): if the valid count
            # ever exceeds the budget, what gets dropped is the latest march steps across
            # all rays (usually occluded, low-transmittance) instead of every sample of
            # the trailing rays — whole-ray truncation renders those rays as background
            # and poisons training with inverted gradients (observed: a single-view
            # budget shrink at epoch ~44 collapsed 41 dB -> 21 dB).
            idx_t = masked_compact_indices(mask.T, budget)  # indices into [S, R] layout
            idx = jnp.where(idx_t < n * s,
                            (idx_t % n) * s + (idx_t // n), n * s)
            cflat = jnp.take(flat, jnp.minimum(idx, n * s - 1), axis=0)
            cray_d = jnp.take(ray_d, jnp.minimum(idx, n * s - 1), axis=0)
            out = nef(channels=req_channels, coords=cflat, ray_d=cray_d,
                      lod_idx=lod_idx, max_compute_lod=max_compute_lod)

            def scatter_back(v):  # [B, C] -> [n, s, C] with padding dropped
                v2 = v.reshape(v.shape[0], -1)
                # per-column rank-1 scatters: windowed row scatters run ~5x slower on TPU
                # (see ops/grid.py gather_rows backward note)
                cols = [jnp.zeros((n * s,), v2.dtype).at[idx].set(v2[:, c], mode="drop")
                        for c in range(v2.shape[-1])]
                return jnp.stack(cols, axis=-1).reshape(n, s, v2.shape[-1])
        else:
            out = nef(channels=req_channels, coords=flat, ray_d=ray_d,
                      lod_idx=lod_idx, max_compute_lod=max_compute_lod)

            def scatter_back(v):  # [n*s, C] -> [n, s, C]
                return v.reshape(n, s, -1)

        color = scatter_back(out["rgb"])
        density = scatter_back(out["density"])[..., 0]

        # Sample-fed density keep-score (instant-ngp's density-grid update from TRAINING
        # samples, nerf_network.cu density_grid semantics): scatter-max the per-sample
        # densities into the blas's cell grid. Training samples concentrate exactly on the
        # learned density shell the RENDERER sees — unlike the prune's single uniform
        # random point per cell, which systematically misses a sub-voxel surface shell and
        # (with the 0.95/prune keep-score decay) eventually culls the most opaque visible
        # cells. Measured round 5 on the exact-backward flagship at epoch 66: 40.9% of the
        # GT SURFACE cells culled, with culled surface cells DENSER (GT p90 14.1) than
        # kept ones (7.5) — the erosion that was misattributed to the stochastic backward
        # in round 4 (results_round4.md). One rank-1 scatter-max (~8 ns/idx) per step.
        density_max_grid = None
        if density_feedback:
            blas = getattr(nef.grid, "blas", None)
            blas_level = getattr(blas, "max_level", None)
            if blas_level is not None and getattr(blas, "occ_grid", None) is not None:
                from wisp_tpu.ops.spc import quantize_points_jnp
                resb = 2 ** blas_level
                if compaction and compaction > 0.0:
                    fb_valid = idx < n * s
                    fb_q = quantize_points_jnp(cflat, blas_level)
                    fb_ids = (fb_q[:, 0] * resb + fb_q[:, 1]) * resb + fb_q[:, 2]
                    fb_ids = jnp.where(fb_valid, fb_ids, resb ** 3)
                    fb_d = jnp.where(fb_valid, out["density"][:, 0], 0.0)
                else:
                    fb_q = quantize_points_jnp(flat, blas_level)
                    fb_ids = (fb_q[:, 0] * resb + fb_q[:, 1]) * resb + fb_q[:, 2]
                    fb_ids = jnp.where(mask.reshape(-1), fb_ids, resb ** 3)
                    fb_d = jnp.where(mask.reshape(-1), out["density"][:, 0], 0.0)
                density_max_grid = jnp.zeros((resb ** 3,), jnp.float32).at[fb_ids].max(
                    jax.lax.stop_gradient(fb_d.astype(jnp.float32)), mode="drop")

        tau = density * deltas * mask.astype(density.dtype)            # optical thickness
        sum_prev = jnp.cumsum(tau, axis=-1) - tau                      # exclusive prefix
        transmittance = jnp.exp(-sum_prev) * (1.0 - jnp.exp(-tau))     # weights [R, S]

        bg = jnp.asarray(bg_color, dtype=color.dtype)
        ray_colors = jnp.sum(transmittance[..., None] * color, axis=1)  # [R, 3]
        alpha = jnp.sum(transmittance, axis=-1, keepdims=True)          # [R, 1]
        rgb = bg[None, :] * (1.0 - alpha) + ray_colors
        hit = alpha[..., 0] > 0.0
        depth = jnp.sum(transmittance * depths, axis=-1, keepdims=True) \
            if "depth" in channels else None

        extra_outputs = {}
        for channel in extra_channels:
            f = scatter_back(out[channel])                              # [R, S, C]
            ray_feats = jnp.sum(transmittance[..., None] * f, axis=1)
            extra_outputs[channel] = alpha * ray_feats

        # valid-sample count feeds the trainer's adaptive ray batching (the reference tracks
        # prev_num_samples host-side, packed_rf_tracer.py:56-66)
        num_valid = jnp.sum(mask.astype(jnp.float32))
        return RenderBuffer(depth=depth, hit=hit[:, None], rgb=rgb, alpha=alpha,
                            num_valid_samples=num_valid,
                            num_overflow=mr.num_overflow,
                            density_max_grid=density_max_grid, **extra_outputs)

    def _trace_segmented(self, nef, rays, channels, extra_channels, req_channels,
                         lod_idx, max_compute_lod, mr, samples, deltas, depths, mask,
                         n, compaction, eps, seg_count, bg_color, density_feedback):
        """Segmented TRUE-transmittance training cull (perf_playbook.md design note;
        the training-admissible analog of the reference renderer's early ray termination,
        reference wisp/tracers/packed_rf_tracer.py:137-165 composited over one packed
        stream — here a lax.scan over G depth segments with the exact accumulated optical
        depth carried between them).

        Each segment g: cull samples on rays whose true transmittance
        T = exp(-acc_tau) <= eps (their weights are < eps by construction — the cull
        criterion is the ray's own decoded optical depth, the rule the compositor itself
        applies, so unlike the cell-peak tau_hat estimate it cannot drop a visible
        sample); step-major compact the survivors into a per-segment budget
        ceil(n*S_g*compaction); decode ONE nef call; integrate with transmittance
        continued from acc_tau; advance acc_tau. Gradients flow through acc_tau across
        segments, so the backward is exact for every decoded sample.

        One scan body = one compiled segment (compile time stays ~flat in G); budgets are
        uniform per segment, so the adaptive compaction budget must cover the PEAK
        per-segment valid fraction — emitted as ``seg_frac_max`` (the trainer's retuner
        keys off it; overflow is counted in ``num_overflow``, never silent)."""
        from wisp_tpu.ops.compaction import masked_compact_indices

        g_cnt = int(seg_count)
        s_total = samples.shape[1]
        s_g = -(-s_total // g_cnt)  # ceil
        pad = g_cnt * s_g - s_total
        if pad:
            samples = jnp.pad(samples, ((0, 0), (0, pad), (0, 0)))
            deltas = jnp.pad(deltas, ((0, 0), (0, pad)))
            depths = jnp.pad(depths, ((0, 0), (0, pad)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
        budget = int(np.ceil(n * s_g * float(compaction) / 128.0)) * 128
        budget = min(budget, n * s_g)
        tau_cap = -float(np.log(eps))

        # [n, G*S_g] -> [G, n, S_g] (segment-major for the scan)
        seg = lambda a, tail: a.reshape((n, g_cnt, s_g) + tail).swapaxes(0, 1)
        xs = {"samples": seg(samples, (3,)), "deltas": seg(deltas, ()),
              "depths": seg(depths, ()), "mask": seg(mask, ())}

        ray_d = jnp.broadcast_to(rays.dirs[:, None, :], (n, s_g, 3)).reshape(n * s_g, 3)

        fb_grid = None
        resb = None
        fb_level = None
        if density_feedback:
            blas = getattr(nef.grid, "blas", None)
            fb_level = getattr(blas, "max_level", None)
            if fb_level is not None and getattr(blas, "occ_grid", None) is not None:
                resb = 2 ** fb_level
                fb_grid = jnp.zeros((resb ** 3,), jnp.float32)

        def body(carry, x):
            acc_tau, fb = carry
            live = acc_tau < tau_cap                              # T > eps
            m = x["mask"] & live[:, None]                         # [n, S_g]
            valid = jnp.sum(m.astype(jnp.float32))
            idx_t = masked_compact_indices(m.T, budget)           # [S_g, n] step-major
            idx = jnp.where(idx_t < n * s_g,
                            (idx_t % n) * s_g + (idx_t // n), n * s_g)
            flat = x["samples"].reshape(n * s_g, 3)
            safe = jnp.minimum(idx, n * s_g - 1)
            cflat = jnp.take(flat, safe, axis=0)
            cray_d = jnp.take(ray_d, safe, axis=0)
            out = nef(channels=req_channels, coords=cflat, ray_d=cray_d,
                      lod_idx=lod_idx, max_compute_lod=max_compute_lod)

            def scatter_back(v):                                  # [B, C] -> [n, S_g, C]
                v2 = v.reshape(v.shape[0], -1)
                cols = [jnp.zeros((n * s_g,), v2.dtype).at[idx].set(v2[:, c],
                                                                    mode="drop")
                        for c in range(v2.shape[-1])]
                return jnp.stack(cols, axis=-1).reshape(n, s_g, v2.shape[-1])

            color = scatter_back(out["rgb"])
            density = scatter_back(out["density"])[..., 0]
            tau = density * x["deltas"] * m.astype(density.dtype)
            sum_prev = jnp.cumsum(tau, axis=-1) - tau             # exclusive, in-segment
            w = jnp.exp(-(acc_tau[:, None] + sum_prev)) * (1.0 - jnp.exp(-tau))
            ys = {
                "rgb": jnp.sum(w[..., None] * color, axis=1),     # [n, 3]
                "alpha": jnp.sum(w, axis=-1),                     # [n]
                "depth": jnp.sum(w * x["depths"], axis=-1),       # [n]
                "valid": valid,
                "overflow": jnp.maximum(valid - float(budget), 0.0),
                "frac": valid / float(n * s_g),
            }
            for ch in extra_channels:
                f = scatter_back(out[ch])
                ys["x_" + ch] = jnp.sum(w[..., None] * f, axis=1)
            if fb is not None:
                fb_valid = idx < n * s_g
                from wisp_tpu.ops.spc import quantize_points_jnp
                fb_q = quantize_points_jnp(cflat, fb_level)
                fb_ids = (fb_q[:, 0] * resb + fb_q[:, 1]) * resb + fb_q[:, 2]
                fb_ids = jnp.where(fb_valid, fb_ids, resb ** 3)
                fb_d = jnp.where(fb_valid, out["density"][:, 0], 0.0)
                fb = fb.at[fb_ids].max(
                    jax.lax.stop_gradient(fb_d.astype(jnp.float32)), mode="drop")
            acc_tau = acc_tau + jnp.sum(tau, axis=-1)
            return (acc_tau, fb), ys

        carry0 = (jnp.zeros((n,), jnp.float32), fb_grid)
        (_, fb_grid), ys = jax.lax.scan(body, carry0, xs)

        ray_colors = jnp.sum(ys["rgb"], axis=0)                   # [n, 3]
        alpha = jnp.sum(ys["alpha"], axis=0)[:, None]             # [n, 1]
        bg = jnp.asarray(bg_color, dtype=ray_colors.dtype)
        rgb = bg[None, :] * (1.0 - alpha) + ray_colors
        hit = alpha[..., 0] > 0.0
        depth = jnp.sum(ys["depth"], axis=0)[:, None] if "depth" in channels else None
        extra_outputs = {ch: alpha * jnp.sum(ys["x_" + ch], axis=0)
                         for ch in extra_channels}
        num_overflow = jnp.sum(ys["overflow"])
        if mr.num_overflow is not None:
            num_overflow = num_overflow + mr.num_overflow
        return RenderBuffer(depth=depth, hit=hit[:, None], rgb=rgb, alpha=alpha,
                            num_valid_samples=jnp.sum(ys["valid"]),
                            num_overflow=num_overflow,
                            seg_frac_max=jnp.max(ys["frac"]),
                            density_max_grid=fb_grid, **extra_outputs)

    def public_properties(self) -> Dict[str, Any]:
        return {
            "Raymarch type": self.raymarch_type,
            "Num steps": self.num_steps,
            "Background color": self.bg_color,
        }
