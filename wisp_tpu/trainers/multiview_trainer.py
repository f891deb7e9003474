"""MultiviewTrainer — NeRF optimization from posed images.

Counterpart of reference wisp/trainers/multiview_trainer.py:33-319. The step is the jitted
forward-trace + loss + backward + update; pruning and adaptive ray batching run host-side at
their cadences:

* adaptive ray batching (reference :95-109): holds total *valid* samples ≈ target_sample_size
  by retuning rays/batch from the previous step's valid-sample count, quantized to
  power-of-two buckets so batch shapes don't thrash the jit cache.
* pruning (reference :85-93): every prune_every iters, nef.prune() rewrites the occupancy
  bitfield (fixed shapes — one-time recompile, see nerf.py docstring).
* loss: l2/l1/huber over rays or samples + optional opacity loss for the first 1k iters
  (reference :140-162).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import time as _time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.core.rays import Rays
from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
from wisp_tpu.ops.image.metrics import lpips as lpips_fn, psnr as psnr_fn, ssim as ssim_fn
from wisp_tpu.trainers.base_trainer import (BaseTrainer, ConfigBaseTrainer,
                                            _touch_heartbeat)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ConfigMultiviewTrainer(ConfigBaseTrainer):
    """(reference multiview_trainer.py:33-63)"""
    start_prune: int = 1000
    prune_every: int = 100
    random_lod: bool = False
    rgb_lambda: float = 1.0
    opacity_loss: float = 0.0
    rgb_loss_type: str = "l2"      # 'l2' | 'l1' | 'huber'
    rgb_loss_denom: str = "rays"   # 'rays' | 'samples'
    target_sample_size: int = 2 ** 18
    save_valid_imgs: bool = False
    adaptive_compaction: bool = False
    # Feed the prune keep-score the per-cell max of TRAINING-sample densities (instant-ngp
    # density-grid semantics; see NeuralRadianceField.prune). Fixes the long-horizon
    # surface-cell erosion the single-point prune query causes once in-training early
    # termination thins the learned density shell (round-5 postmortem: the round-4
    # "stochastic backward erosion" reproduced with the EXACT backward — 40.9% of GT
    # surface cells culled by epoch 66). Single-chip; dp steps keep the query-only prune.
    prune_sample_feedback: bool = True
    # HBM-safe ceiling on num_rays * num_steps * compaction_budget — the compacted-sample
    # slot count that drives the hash-interp row-gather's padded temp (~512 B/slot on TPU:
    # 2^21 slots ≈ 8.6 GB peak, fits 16 GB; 2^22 OOMs). Adaptive rays and adaptive
    # compaction each retune independently; without this cap a transient (high budget
    # not yet shrunk) x (ray growth) product can OOM mid-run — observed at lego-proxy
    # epoch 10: rays 4096->8192 with budget still 1.0 = 4.2M slots = 19.5 GB.
    max_compacted_samples: int = 2 ** 21
    # inference-only early ray termination: march in `render_segments` depth segments,
    # dropping rays whose transmittance fell below `render_early_stop` (opaque scenes
    # finish most rays in the first segment). 1 = classic single-pass rendering.
    render_segments: int = 1
    render_early_stop: float = 1e-3


class MultiviewTrainer(BaseTrainer):
    # retune cost accounting (VERDICT r4 weak #7): every compaction retune is a full
    # step recompile — ~20 s compile locally but 3-8 MIN over the remote-TPU tunnel.
    # Shrinks (pure perf, zero quality effect) only fire when the measured recompile
    # cost amortizes over the run's remaining steps; counts + wall go to the parquet.
    # (class-level defaults: these are measurement state, not configuration)
    _retune_count = 0
    _retune_wall_s = 0.0
    _retune_cost_ema = None   # measured s per retuned step (incl. recompile)
    _step_wall_ema = None
    _last_step_t = None
    # anti-flap state (see calc_adaptive_compaction): last shrink origin + a floor below
    # which shrinking is blacklisted after a grow reversed a recent shrink
    _last_shrink_from = None
    _last_shrink_iter = -10 ** 9
    _shrink_floor = 0.0
    _shrink_floor_until = -1

    # compaction shrink decisions use the max valid fraction over this many recent steps
    FRAC_WINDOW_STEPS = 32
    # shrink only when the windowed-max fraction fits the target bucket with this much
    # extra room — keeps the grow/shrink thresholds ~1.5x apart (see calc_adaptive_compaction)
    SHRINK_MARGIN = 1.3

    def __init__(self, cfg: ConfigMultiviewTrainer, pipeline, train_dataset,
                 validation_dataset=None, tracker=None, scene_state=None, device=None,
                 mesh=None):
        super().__init__(cfg=cfg, pipeline=pipeline, train_dataset=train_dataset,
                         tracker=tracker, scene_state=scene_state, device=device, mesh=mesh)
        self.validation_dataset = validation_dataset
        self.scene_state.graph.cameras = dict(train_dataset.cameras)
        self._prev_num_samples = None
        self._prev_seg_frac_max = None
        # trailing valid-fraction window for compaction shrink decisions (see
        # calc_adaptive_compaction — single-step shrink caused training collapse)
        self._frac_window = []
        self._steps_since_retune = 0
        # Sample-fed prune keep-score (see NeuralRadianceField.prune docstring): the step
        # carries a per-cell running max of training-sample densities, consumed and reset
        # at each prune. Single-chip only (the dp step's collectives stay gradient-only).
        self._density_feedback = False
        self._density_max_grid = None
        # post-retune checkpoint baseline (see _checkpoint_on_retune): shapes already
        # compiled this process — only a NEVER-seen shape implies a fresh (expensive)
        # compile worth checkpointing before. A retuner flipping between two already-
        # cached shapes (e.g. the ray bucket straddling a po2 edge across views) is a
        # jit-cache HIT and must not trigger saves (observed live: a save flood every
        # retune window, ~6/min, on the r5-flagship-noes run).
        self._ckpt_shapes_seen = {self._step_shape()}
        blas = getattr(getattr(pipeline.nef, "grid", None), "blas", None)
        if (cfg.prune_sample_feedback and mesh is None and cfg.prune_every > -1
                and getattr(pipeline.nef, "prune_density_decay", None) is not None
                and getattr(blas, "occ_grid", None) is not None):
            self._density_feedback = True
            self._density_max_grid = jnp.zeros(
                ((2 ** blas.max_level) ** 3,), jnp.float32)

    def pre_training(self):
        super().pre_training()
        self.tracker.metrics.define_metric("rgb_loss", aggregation_type=float)

    # -- checkpoint extras: adaptive-tuner state (see BaseTrainer.extra_state) ----------------
    def extra_state(self):
        extra = super().extra_state()
        tracer = self.pipeline.tracer
        extra.update({
            "prev_num_samples": self._prev_num_samples,
            "frac_window": list(self._frac_window),
            "steps_since_retune": self._steps_since_retune,
            "tracer_compaction": getattr(tracer, "compaction", None),
            "retune_count": self._retune_count,
            "retune_wall_s": self._retune_wall_s,
        })
        if isinstance(self.train_dataset.transform, SampleRays):
            extra["transform_num_samples"] = self.train_dataset.transform.num_samples
        if self._density_feedback and self._density_max_grid is not None:
            extra["density_max_grid"] = np.asarray(self._density_max_grid)
        return extra

    def load_extra_state(self, extra):
        super().load_extra_state(extra)
        self.sync_pipeline()  # restored arrays -> pipeline before any tracer swap
        self._prev_num_samples = extra.get("prev_num_samples")
        self._frac_window = list(extra.get("frac_window", []))
        self._steps_since_retune = extra.get("steps_since_retune", 0)
        self._retune_count = extra.get("retune_count", 0)
        self._retune_wall_s = extra.get("retune_wall_s", 0.0)
        n = extra.get("transform_num_samples")
        if n and isinstance(self.train_dataset.transform, SampleRays):
            self.train_dataset.transform.set_num_samples(int(n))
        budget = extra.get("tracer_compaction")
        tracer = self.pipeline.tracer
        if budget is not None and hasattr(tracer, "compaction") \
                and tracer.compaction != budget:
            self.refresh_pipeline(
                self.pipeline.replace(tracer=tracer.replace(compaction=budget)))
        if self._density_feedback and extra.get("density_max_grid") is not None:
            self._density_max_grid = jnp.asarray(extra["density_max_grid"])
        # the restored tuner state IS the checkpointed step shape — don't re-save it
        self._ckpt_shapes_seen = {self._step_shape()}

    # -- pruning (reference :85-93) -----------------------------------------------------------
    _prune_fn = None

    def pre_step(self):
        super().pre_step()
        if self.cfg.prune_every > -1 and self.total_iterations > 1 and \
                self.total_iterations >= self.cfg.start_prune and \
                self.total_iterations % self.cfg.prune_every == 0:
            pipeline = self.sync_pipeline()
            if getattr(pipeline.nef, "prune_density_decay", None) is None or \
                    getattr(pipeline.nef.grid, "occupancy", None) is None:
                return
            if self._prune_fn is None:
                # the whole prune step (density re-query over every dense cell + threshold +
                # bitfield rewrite) is one jit — eager dispatch over the device tunnel costs
                # seconds PER OP (CLAUDE.md), and prune touches millions of cells
                if self._density_feedback:
                    self._prune_fn = jax.jit(
                        lambda nef, key, smax: nef.prune(key=key, sample_max=smax))
                else:
                    self._prune_fn = jax.jit(lambda nef, key: nef.prune(key=key))
            if self._density_feedback:
                new_nef = self._prune_fn(pipeline.nef, self.next_key(),
                                         self._density_max_grid)
                # fresh evidence window per prune interval
                self._density_max_grid = jnp.zeros_like(self._density_max_grid)
            else:
                new_nef = self._prune_fn(pipeline.nef, self.next_key())
            self.refresh_pipeline(pipeline.replace(nef=new_nef))

    # -- adaptive ray batching (reference :95-109) ---------------------------------------------
    def calc_adaptive_rays(self, num_rays_in_batch: int):
        if self._prev_num_samples is None:
            return
        samples_per_ray = self._prev_num_samples / max(num_rays_in_batch, 1)
        num_rays = self.cfg.target_sample_size / max(samples_per_ray, 1)
        num_rays = int(min(num_rays, 2 ** 18))
        # bucket to powers of two: stable jit cache (SURVEY.md §5.7 recompilation-free sizing)
        num_rays = 2 ** int(math.floor(math.log2(max(num_rays, 256))))
        # memory cap: never let rays * steps * budget exceed the HBM-safe slot count,
        # whatever the (independently retuned) compaction budget currently is
        tracer = self.pipeline.tracer
        budget = getattr(tracer, "compaction", None) or 1.0
        steps = getattr(tracer, "num_steps", 1) or 1
        while num_rays > 256 and num_rays * steps * budget > self.cfg.max_compacted_samples:
            num_rays //= 2
        if isinstance(self.train_dataset.transform, SampleRays):
            self.train_dataset.transform.set_num_samples(num_rays)
        if self.cfg.adaptive_compaction:
            self.calc_adaptive_compaction(num_rays_in_batch)
        self._checkpoint_on_retune()

    def _step_shape(self):
        """The tuner-controlled part of the compiled step configuration: a change in
        either member forces a full step recompile on the next step."""
        return (self.train_dataset.transform.num_samples
                if isinstance(self.train_dataset.transform, SampleRays) else None,
                getattr(self.pipeline.tracer, "compaction", None))

    def _checkpoint_on_retune(self):
        """Checkpoint immediately when a tuner moves the step to a NEVER-yet-compiled
        configuration (ray-batch po2 bucket or compaction budget). Tunnel wedges cluster
        at the long fresh-compile that follows (round-4/5 postmortems), and the periodic
        epoch checkpoint predates the retune — a watchdog relaunch then re-pays every
        retune since that save (~4 min of recompiles each). Saving the retuned tuner
        state NOW makes kill+relaunch resume into the already-retuned configuration.
        Flips between already-cached shapes are jit-cache hits — no compile at risk, no
        save (a live run flooded ~6 saves/min when the ray bucket straddled a po2 edge).
        No-op unless train-state checkpointing is enabled."""
        if self.cfg.checkpoint_every <= -1:
            return
        shape = self._step_shape()
        if shape in self._ckpt_shapes_seen:
            return
        self._ckpt_shapes_seen.add(shape)
        try:
            self.save_training_state()
        except Exception as e:  # noqa: BLE001 — a failed extra save must not kill training
            log.warning(f"post-retune checkpoint failed ({e}); continuing")

    def calc_adaptive_compaction(self, num_rays_in_batch: int):
        """Retune the tracer's compaction budget to the measured valid-sample fraction
        (po2-bucketed with 1.5x headroom). Hysteresis: grow immediately (truncation hurts
        quality) but shrink only past a full extra bucket, so oscillation around a bucket
        edge can't recompile every step. This is the TPU twin of adaptive ray batching:
        gathers are the step cost and their count is budget-bound (CLAUDE.md cost model)."""
        tracer = self.pipeline.tracer
        if tracer is None or not hasattr(tracer, "compaction"):
            return
        current = tracer.compaction or 0.0
        total = max(num_rays_in_batch, 1) * tracer.num_steps
        frac = self._prev_num_samples / total
        if getattr(self, "_prev_seg_frac_max", None) is not None:
            # segmented training cull: per-segment budgets are uniform, so the budget
            # must cover the PEAK segment's valid fraction (packed_rf_tracer
            # _trace_segmented), not the global mean fraction
            frac = self._prev_seg_frac_max
        # Valid fraction varies per VIEW; sizing the budget off a single step's fraction
        # shrank into that variance and truncated subsequent steps (collapse observed at
        # epoch ~44: 41 dB -> 21 dB). Growth stays immediate (driven by the current step);
        # shrinking keys off the max fraction over a trailing window of steps and is
        # rate-limited to one retune per window — a 50-epoch run otherwise sat at 4x the
        # needed budget because the old rule demanded a two-bucket drop.
        self._frac_window.append(frac)
        if len(self._frac_window) > self.FRAC_WINDOW_STEPS:
            self._frac_window.pop(0)
        self._steps_since_retune += 1
        frac_hi = max(self._frac_window)
        # Hysteresis: the grow threshold (frac > 0.77*budget, via the 15% deadband) and
        # the shrink threshold (frac_hi < 0.36*budget with half-octave buckets) are >2x
        # apart, so per-VIEW valid-fraction variance cannot ping-pong the budget across a
        # bucket edge (each flip is a full recompile over the tunnel).
        # Observed on the lego-proxy headline runs: 7% variance (0.0207-0.0221) broke the
        # original 5% grow band, and 26% variance (0.0205-0.0258) broke the 15% band alone
        # because shrink still fired whenever a low-view window fit one bucket down.
        # Growing late is safe: truncation only begins at frac > budget itself, and
        # over-budget truncation is benign (step-major order drops late, occluded samples).
        # Buckets are HALF-octave (x1.41 steps, round 4): the old power-of-two buckets
        # landed the flagship steady state at budget 0.0625 for valid fraction 0.028 —
        # 2.2x slot padding, every padded slot paying interp gathers + scatters. Finer
        # buckets cost at most a few extra rate-limited recompiles per run.
        def _bucket(x: float) -> float:
            return min(1.0, 2.0 ** (math.ceil(2.0 * math.log2(max(x, 1.0 / 512))) / 2.0))

        budget = _bucket(frac * 1.5 / 1.15)
        shrink_to = _bucket(frac_hi * 1.5 * self.SHRINK_MARGIN)
        if budget > current + 1e-9:
            # Anti-flap (round 5: the r5-flagship-fb run ping-ponged 0.125<->0.177<->0.25
            # for 8 of its 15 retunes, ~21 min of recompiles): a grow that REVERSES a
            # recent shrink means the window-max under-sampled the true variance — growth
            # proceeds immediately (truncation hurts quality) but shrinking back below
            # this level is blacklisted for a long cooldown.
            if self._last_shrink_from is not None \
                    and budget >= self._last_shrink_from - 1e-9 \
                    and self.total_iterations - self._last_shrink_iter \
                    <= 4 * self.FRAC_WINDOW_STEPS:
                self._shrink_floor = budget
                self._shrink_floor_until = self.total_iterations \
                    + 16 * self.FRAC_WINDOW_STEPS
                log.info(f"adaptive compaction: grow to {budget:.4f} reverses the "
                         f"shrink at iter {self._last_shrink_iter}; shrinks below it "
                         f"blacklisted for {16 * self.FRAC_WINDOW_STEPS} steps")
            new_budget, why = budget, frac
        elif len(self._frac_window) >= self.FRAC_WINDOW_STEPS \
                and self._steps_since_retune >= self.FRAC_WINDOW_STEPS \
                and shrink_to < current - 1e-9:
            if self.total_iterations < self._shrink_floor_until \
                    and shrink_to < self._shrink_floor - 1e-9:
                self._steps_since_retune = 0
                return
            if not self._shrink_pays_off(current, shrink_to):
                self._steps_since_retune = 0  # re-evaluate a window later, not every step
                return
            self._last_shrink_from = current
            self._last_shrink_iter = self.total_iterations
            new_budget, why = shrink_to, frac_hi
        else:
            return
        # memory cap (see max_compacted_samples): growth past the HBM-safe slot count is
        # refused — step-major truncation drops late, occluded samples and the rays
        # retuner shrinks the batch next step, after which growth can proceed
        cap_budget = self.cfg.max_compacted_samples / total
        if new_budget > cap_budget:
            capped = min(1.0, 2.0 ** math.floor(math.log2(max(cap_budget, 1.0 / 512))))
            if capped <= current + 1e-9:
                log.warning(
                    f"adaptive compaction: budget {new_budget:.4f} (valid fraction "
                    f"{why:.4f}) exceeds the max_compacted_samples cap at {total} slots; "
                    f"keeping {current:.4f} (step-major truncation active)")
                return
            new_budget = capped
        self._steps_since_retune = 0
        self._retune_count += 1
        log.info(f"adaptive compaction: budget {current:.4f} -> {new_budget:.4f} "
                 f"(valid fraction {why:.4f}; retune #{self._retune_count})")
        pipeline = self.sync_pipeline()
        self.refresh_pipeline(
            pipeline.replace(tracer=tracer.replace(compaction=new_budget)))

    def _shrink_pays_off(self, current: float, new: float) -> bool:
        """Cost-aware shrink gate (VERDICT r4 weak #7 / CLAUDE.md round-4 measurement):
        a compaction SHRINK saves slot-proportional work (interp gathers + backward
        scatters, ~70% of a step — CLAUDE.md stage budget) but costs one full step
        recompile, which on the remote-TPU tunnel is 3-8 MIN. Shrink only when the
        measured per-step saving amortizes the measured recompile cost over the run's
        remaining steps with 2x margin. Growth is never gated (truncation hurts quality)."""
        step_s = self._step_wall_ema
        if step_s is None:
            return True  # no data yet: keep first-shrink behavior of fast backends
        recompile_s = self._retune_cost_ema
        if recompile_s is None:
            recompile_s = 20.0 * step_s  # prior: one recompile ~ tens of steps anywhere
        steps_remaining = max(
            self.iterations_per_epoch * self.max_epochs - self.total_iterations, 0)
        savings_per_step = step_s * 0.7 * (1.0 - new / max(current, 1e-9))
        if savings_per_step * steps_remaining > 2.0 * recompile_s:
            return True
        log.info(
            f"adaptive compaction: shrink {current:.4f} -> {new:.4f} refused — "
            f"recompile ~{recompile_s:.0f}s doesn't amortize over {steps_remaining} "
            f"steps at {savings_per_step * 1e3:.1f} ms/step saved")
        return False

    def compute_loss(self, pipeline, batch, key):
        if len(batch) == 2:
            # packed step layout: ONE [N, 9] upload (origins | dirs | rgb) instead of
            # three — each committed host array is its own transfer, and on the remote
            # tunnel each transfer is a round trip (see step()). dist bounds are static
            # per dataset and baked at trace time (self._ray_dist set in step()).
            packed, step_idx = batch
            if packed.shape[1] == 11:
                # per-ray dist bounds ride as two extra packed columns (traced inputs)
                rays = Rays(origins=packed[:, 0:3], dirs=packed[:, 3:6],
                            dist_min=packed[:, 9], dist_max=packed[:, 10])
            else:
                dmin, dmax = self._ray_dist
                rays = Rays(origins=packed[:, 0:3], dirs=packed[:, 3:6],
                            dist_min=dmin, dist_max=dmax)
            img_gts = packed[:, 6:9]
        else:
            rays, img_gts, step_idx = batch
        lod_idx = None
        if self.cfg.random_lod:
            # geometric distribution over LODs favoring fine levels
            # (reference multiview_trainer.py:127-132); traced so no per-step recompiles
            num_lods = pipeline.nef.grid.num_lods
            weights = jnp.asarray([2.0 ** i for i in range(num_lods)])
            lod_idx = jax.random.choice(key, num_lods, p=weights / weights.sum())
        rb = pipeline(rays=rays, lod_idx=lod_idx, channels=["rgb", "alpha"], key=key,
                      density_feedback=self._density_feedback)

        if self.cfg.rgb_loss_type == "l2":
            rgb_loss = (rb.rgb - img_gts) ** 2
        elif self.cfg.rgb_loss_type == "l1":
            rgb_loss = jnp.abs(rb.rgb - img_gts)
        elif self.cfg.rgb_loss_type == "huber":
            diff = rb.rgb - img_gts
            adiff = jnp.abs(diff)
            rgb_loss = jnp.where(adiff < 1.0, 0.5 * diff ** 2, adiff - 0.5)
        else:
            raise NotImplementedError(self.cfg.rgb_loss_type)

        num_valid_samples = jnp.maximum(
            getattr(rb, "num_valid_samples", jnp.asarray(1.0)), 1.0)
        if self.cfg.rgb_loss_denom == "samples":
            rgb_loss = rgb_loss.sum() / num_valid_samples
        else:
            rgb_loss = rgb_loss.mean()
        loss = self.cfg.rgb_lambda * rgb_loss

        opacity_loss = jnp.asarray(0.0)
        if self.cfg.opacity_loss > 0.0:
            # applied for the first 1000 iterations only (reference :160-162); the iteration
            # index is a traced scalar so the gate doesn't bake into the compiled program
            opacity_loss = jnp.mean((1.0 - rb.alpha) ** 2)
            loss = loss + jnp.where(step_idx < 1000,
                                    self.cfg.opacity_loss * opacity_loss, 0.0)

        # one packed stats vector: the host fetches ONE array per step instead of three
        # scalars (each fetch is a tunnel round trip). Under dp this is pmean'd per
        # dp_shard_map's aux rule; step() rescales the count element by mesh size.
        # With the segmented training cull active, the tracer also emits the PEAK
        # per-segment valid fraction (uniform per-segment budgets must cover the peak,
        # not the mean — calc_adaptive_compaction keys off it); it rides as a 4th entry.
        stats_list = [loss, rgb_loss, num_valid_samples]
        seg_frac = getattr(rb, "seg_frac_max", None)
        if seg_frac is not None:
            stats_list.append(seg_frac)
        host_stats = jnp.stack(stats_list)
        aux = {"rgb_loss": rgb_loss, "opacity_loss": opacity_loss,
               "num_valid_samples": num_valid_samples, "host_stats": host_stats}
        if getattr(rb, "num_overflow", None) is not None:
            # voxel-mode capacity honesty: rays whose visible occupied voxels exceeded
            # the march budget (bench reports it; a nonzero steady-state value means
            # march_budget must grow)
            aux["num_overflow"] = rb.num_overflow
        if self._density_feedback:
            # consumed (and popped) by the step fn's running-max carry — never fetched
            aux["density_grid_update"] = rb.density_max_grid
        return loss, aux

    # deferred one-step stats fetch: (device_array, num_rays_of_that_step)
    _pending_stats = None

    def step(self, data):
        rays: Rays = data["rays"]
        num_rays = int(rays.origins.shape[0])
        step_idx = np.int32(self.total_iterations)
        if isinstance(rays.origins, jax.Array):
            # already device-resident (e.g. a multi-host-assembled global batch) — do NOT
            # round-trip it through the host; use the unpacked layout
            batch = (rays, jnp.asarray(data["rgb"]), step_idx)
        else:
            # ONE host->device transfer for the whole batch (origins|dirs|rgb); the remote
            # tunnel pays a round trip per committed array (round-4 headline run: the
            # 8-transfer step loop spent ~450 ms/step in RTTs on a ~190 ms step)
            cols = [np.asarray(rays.origins, np.float32),
                    np.asarray(rays.dirs, np.float32),
                    np.asarray(data["rgb"], np.float32)]
            if np.ndim(rays.dist_min) > 0 or np.ndim(rays.dist_max) > 0:
                # per-ray bounds (e.g. a dataset with per-view near/far arrays) must stay
                # TRACED — baking an array constant would silently pin the first batch's
                # values for the whole run. They ride as two extra packed columns.
                cols.append(np.broadcast_to(
                    np.asarray(rays.dist_min, np.float32).reshape(-1, 1),
                    (num_rays, 1)))
                cols.append(np.broadcast_to(
                    np.asarray(rays.dist_max, np.float32).reshape(-1, 1),
                    (num_rays, 1)))
            else:
                dist = (float(rays.dist_min), float(rays.dist_max))
                if getattr(self, "_ray_dist", None) is not None \
                        and self._ray_dist != dist:
                    # scalar bounds are baked at trace time; a changed value with an
                    # unchanged batch shape would otherwise be silently ignored
                    log.info(f"ray dist bounds changed {self._ray_dist} -> {dist}; "
                             "rebuilding the step function")
                    self._step_fn = None
                self._ray_dist = dist
            packed = np.concatenate(cols, axis=1)
            batch = (packed, step_idx)
        rebuilt = self._step_fn is None and self._pre_training_done
        t0 = _time.time()
        loss, aux = self.run_step(batch)
        call_s = _time.time() - t0
        if rebuilt:
            # jit trace+compile is synchronous inside the call — this wall IS the retune
            # cost the shrink rule amortizes against (tunnel AOT compiles included)
            self._retune_wall_s += call_s
            self._retune_cost_ema = call_s if self._retune_cost_ema is None \
                else 0.5 * self._retune_cost_ema + 0.5 * call_s
        elif self._last_step_t is not None:
            dt = t0 - self._last_step_t
            self._step_wall_ema = dt if self._step_wall_ema is None \
                else 0.9 * self._step_wall_ema + 0.1 * dt
        self._last_step_t = t0
        # Defer the (blocking) stats fetch by one step: fetching step k's stats while
        # step k+1 is already enqueued overlaps the round trip with device compute.
        # Adaptive rays/compaction then act on one-step-old numbers — they are windowed
        # and rate-limited, so staleness of one step is benign.
        prev = self._pending_stats
        self._pending_stats = (aux.get("host_stats"), num_rays)
        if prev is not None:
            self._apply_stats(*prev)

    def _apply_stats(self, stats, num_rays):
        s = np.asarray(stats)
        n_mesh = self.mesh.devices.size if self.mesh is not None else 1
        self.tracker.metrics.total_loss += float(s[0])
        self.tracker.metrics.rgb_loss += float(s[1])
        # host_stats is pmean'd over dp shards; num_valid_samples is a global count
        self._prev_num_samples = (float(s[2]) * n_mesh) or None
        # peak per-segment valid fraction (segmented training cull; shard-mean under dp —
        # shards are random ray subsets so their per-segment fractions track closely)
        self._prev_seg_frac_max = float(s[3]) if len(s) > 3 else None
        self.calc_adaptive_rays(num_rays)

    def _flush_stats(self):
        if self._pending_stats is not None:
            self._apply_stats(*self._pending_stats)
            self._pending_stats = None

    def log_console(self):
        self._flush_stats()  # epoch averages must include the last step of the epoch
        total_loss = self.tracker.metrics.average_metric("total_loss")
        rgb_loss = self.tracker.metrics.average_metric("rgb_loss")
        log.info("EPOCH {}/{} | total loss: {:>.3E} | rgb loss: {:>.3E}".format(
            self.epoch, self.max_epochs, total_loss, rgb_loss))

    # -- validation (reference :191-303) -------------------------------------------------------
    _infer_cache = None
    _infer_seg_cache = None

    def render_view(self, pipeline, rays: Rays, chunk: int = 32768,
                    return_buffer: bool = False):
        """Full-view inference in chunks through a jitted (cached) tracer call.
        Returns the rgb array, or the concatenated RenderBuffer with return_buffer=True
        (for multi-channel EXR dumps, reference multiview_trainer.py:228-240).

        With cfg.render_segments > 1, marching is split into depth segments with
        transmittance carried across them; rays whose transmittance drops below
        cfg.render_early_stop are compacted away between segments (the fixed-shape analog
        of the reference renderer's early ray termination — opaque scenes finish most rays
        in the first segment, so later segments run on a fraction of the rays)."""
        if int(self.cfg.render_segments or 1) > 1:
            return self._render_view_segmented(pipeline, rays, chunk,
                                               return_buffer=return_buffer)
        if self._infer_cache is None:
            self._infer_cache = jax.jit(
                lambda p, r: p(rays=r, channels=["rgb", "alpha", "depth"]))
        infer = self._infer_cache

        outs = []
        n = rays.origins.shape[0]
        # don't let chunk padding dwarf the actual ray count (pad to a 1024 multiple)
        chunk = min(chunk, max(1024, int(2 ** np.ceil(np.log2(max(n, 1))))))
        chunk = self._clamp_render_chunk(chunk, pipeline)
        pad = (-n) % chunk
        origins = np.concatenate([np.asarray(rays.origins),
                                  np.zeros((pad, 3), np.float32)])
        dirs = np.concatenate([np.asarray(rays.dirs), np.ones((pad, 3), np.float32)])
        for i in range(0, n + pad, chunk):
            _touch_heartbeat(self.epoch, i, "render")  # validation must not trip the watchdog
            r = Rays(jnp.asarray(origins[i:i + chunk]), jnp.asarray(dirs[i:i + chunk]),
                     rays.dist_min, rays.dist_max)
            outs.append(jax.device_get(infer(pipeline, r)))
        if return_buffer:
            from wisp_tpu.core.render_buffer import RenderBuffer
            return RenderBuffer.cat(outs)[:n]
        rgb = np.concatenate([np.asarray(o.rgb) for o in outs])[:n]
        return rgb

    def _clamp_render_chunk(self, chunk: int, pipeline) -> int:
        """Clamp the render chunk so chunk * num_steps * compaction_budget never exceeds
        the HBM-safe compacted-slot cap. Regression (round 5, r5-flagship-noes run): the
        epoch-25 validation compiled a 32768-ray chunk at 512 steps with the budget still
        at 0.25 -> 4.2M slots = 19.05 GB on a 15.75 GB chip; earlier runs only survived
        because their budget had already shrunk below 0.1 by the first validation."""
        tracer = pipeline.tracer
        steps = getattr(tracer, "num_steps", None) or 1
        budget = getattr(tracer, "compaction", None) or 0.0
        if budget <= 0.0:
            return chunk
        cap = int(self.cfg.max_compacted_samples / (steps * budget))
        while chunk > 1024 and chunk > cap:
            chunk //= 2
        return chunk

    def _render_view_segmented(self, pipeline, rays: Rays, chunk: int = 32768,
                               return_buffer: bool = False):
        """Segmented marching with transmittance carry + ray compaction (see render_view).

        Each segment traces with bg_color=0 so the tracer returns premultiplied color and
        segment opacity; compositing is the standard over operator:
        C += T * rgb_seg, T *= (1 - alpha_seg). Live rays are host-compacted into
        power-of-two buckets between segments so each bucket size compiles once."""
        chunk = self._clamp_render_chunk(chunk, pipeline)
        segs = int(self.cfg.render_segments)
        eps = float(self.cfg.render_early_stop)
        if self._infer_seg_cache is None:
            num_steps = getattr(pipeline.tracer, "num_steps", 64)
            seg_steps = max(8, int(np.ceil(num_steps / segs)))
            self._infer_seg_cache = jax.jit(
                lambda p, r: p(rays=r, channels=["rgb", "alpha"],
                               bg_color=(0.0, 0.0, 0.0), num_steps=seg_steps))
        infer = self._infer_seg_cache

        n = rays.origins.shape[0]
        origins = np.asarray(rays.origins).reshape(n, 3)
        dirs = np.asarray(rays.dirs).reshape(n, 3)
        edges = np.linspace(float(np.min(rays.dist_min)), float(np.max(rays.dist_max)),
                            segs + 1)
        color = np.zeros((n, 3), np.float32)
        trans = np.ones((n,), np.float32)
        live = np.arange(n)
        for k in range(segs):
            if live.size == 0:
                break
            bucket = max(1024, int(2 ** np.ceil(np.log2(live.size))))
            idx = np.concatenate([live, np.zeros(bucket - live.size, live.dtype)])
            for i in range(0, bucket, chunk):
                sl = idx[i:i + chunk]
                m = max(0, min(live.size - i, sl.size))   # real (non-pad) entries
                if m == 0:
                    break
                r = Rays(jnp.asarray(origins[sl]), jnp.asarray(dirs[sl]),
                         float(edges[k]), float(edges[k + 1]))
                rb = jax.device_get(infer(pipeline, r))
                real = sl[:m]
                color[real] += trans[real, None] * np.asarray(rb.rgb)[:m]
                trans[real] = trans[real] * (1.0 - np.asarray(rb.alpha)[:m, 0])
            live = live[trans[live] > eps]
        bg = np.asarray(getattr(pipeline.tracer, "bg_color", (1.0, 1.0, 1.0)), np.float32)
        rgb = color + trans[:, None] * bg[None, :]
        if return_buffer:
            from wisp_tpu.core.render_buffer import RenderBuffer
            return RenderBuffer(rgb=rgb, alpha=(1.0 - trans)[:, None])
        return rgb

    def evaluate_metrics(self, dataset, lod_idx=None, name: str = "validation"):
        pipeline = self.sync_pipeline()
        h, w = dataset.img_shape
        want_lpips = "lpips" in self.cfg.valid_metrics
        if want_lpips:
            from wisp_tpu.ops.image.metrics import lpips_available
            if not lpips_available():
                want_lpips = False
                if not getattr(self, "_lpips_drop_warned", False):
                    log.warning("'lpips' in valid_metrics but no weights configured "
                                "(set WISP_LPIPS_WEIGHTS); dropping the metric")
                    self._lpips_drop_warned = True
        psnrs, ssims, lpipss = [], [], []
        for i in range(len(dataset)):
            batch = dataset.data  # untransformed full views
            rays = batch["rays"][i]
            gts = np.asarray(batch["rgb"][i])
            if self.cfg.save_valid_imgs:
                rb = self.render_view(pipeline, rays, return_buffer=True)
                rgb = np.asarray(rb.rgb)
            else:
                rgb = self.render_view(pipeline, rays)
            if "psnr" in self.cfg.valid_metrics:
                psnrs.append(psnr_fn(rgb, gts))
            if "ssim" in self.cfg.valid_metrics:
                ssims.append(ssim_fn(rgb.reshape(h, w, 3), gts.reshape(h, w, 3)))
            if want_lpips:
                lpipss.append(lpips_fn(rgb.reshape(h, w, 3), gts.reshape(h, w, 3)))
            if self.cfg.save_valid_imgs:
                from wisp_tpu.ops.image.io import write_exr, write_png
                write_png(os.path.join(self.tracker.log_dir, f"{name}_{i}.png"),
                          rgb.reshape(h, w, 3))
                # full multi-channel EXR dump (reference multiview_trainer.py:228-240
                # via pyexr; here the self-contained writer)
                exr = {k: np.asarray(v).reshape(h, w, -1)
                       for k, v in rb.exr_dict().items()
                       if np.asarray(v).ndim > 0 and np.asarray(v).shape[0] == h * w}
                exr["rgb"] = exr.pop("default")
                write_exr(os.path.join(self.tracker.log_dir, f"{name}_{i}.exr"), exr)
        metrics = {}
        if psnrs:
            metrics["psnr"] = float(np.mean(psnrs))
        if ssims:
            metrics["ssim"] = float(np.mean(ssims))
        if lpipss:
            metrics["lpips"] = float(np.mean(lpipss))
        return metrics

    def validate(self) -> Dict[str, Any]:
        dataset = self.validation_dataset if self.validation_dataset is not None \
            else self.train_dataset
        metrics = self.evaluate_metrics(dataset, name=f"ep{self.epoch}")
        log_text = "EPOCH {}/{}".format(self.epoch, self.max_epochs)
        for k, v in metrics.items():
            log_text += " | {}: {:.2f}".format(k, v)
            self.tracker.log_metric(f"validation/{k}", v, self.epoch)
        log.info(log_text)

        record_dict = self.tracker.get_record_dict() or {}
        record_dict.update(metrics)
        record_dict["epoch"] = self.epoch
        # retune cost visibility (VERDICT r4 weak #7): how many recompiles this run has
        # paid for adaptive compaction, and their total wall
        record_dict["retune_count"] = self._retune_count
        record_dict["retune_wall_s"] = round(self._retune_wall_s, 1)
        try:
            import pandas as pd
            parquet_path = os.path.join(self.tracker.log_dir, "logs.parquet")
            df = pd.DataFrame([record_dict])
            if os.path.exists(parquet_path):
                df = pd.concat([pd.read_parquet(parquet_path), df], ignore_index=True)
            df.to_parquet(parquet_path)
        except Exception as e:  # noqa: BLE001
            log.warning(f"parquet record write failed: {e}")

        self.return_dict.update(metrics)
        self.return_dict.setdefault("psnr_by_epoch", {})[self.epoch] = metrics.get("psnr")
        return metrics
