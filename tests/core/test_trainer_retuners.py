"""Adaptive-ray / adaptive-compaction retuners respect the HBM memory cap.

Regression for the lego-proxy headline OOM: the two retuners tune independently, and a
transient (budget not yet shrunk) x (ray growth) product reached 4.2M compacted slots
= 19.5 GB of padded row-gather temp on a 16 GB chip. `max_compacted_samples` now caps
num_rays * num_steps * budget in BOTH retuners (rays shrink first — quality-neutral;
budget growth past the cap is refused with a warning, step-major truncation covering)."""

import types

import pytest

pytestmark = pytest.mark.smoke

from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
from wisp_tpu.tracers import PackedRFTracer
from wisp_tpu.trainers.multiview_trainer import ConfigMultiviewTrainer, MultiviewTrainer


class _FakePipeline:
    def __init__(self, tracer):
        self.tracer = tracer

    def replace(self, tracer):
        return _FakePipeline(tracer)


def _bare_trainer(tracer, num_rays, **cfg_kw):
    t = MultiviewTrainer.__new__(MultiviewTrainer)
    t.cfg = ConfigMultiviewTrainer(**cfg_kw)
    t.pipeline = _FakePipeline(tracer)
    t.train_dataset = types.SimpleNamespace(transform=SampleRays(num_samples=num_rays))
    t._frac_window = []
    t._steps_since_retune = 0
    t.iterations_per_epoch = 100
    t.max_epochs = 100
    t.epoch, t.iteration = 1, 0
    t.sync_pipeline = lambda: t.pipeline
    def _refresh(p):
        t.pipeline = p
    t.refresh_pipeline = _refresh
    return t


def test_adaptive_rays_capped_by_memory():
    # the OOM shape: 32 valid samples/ray measured at 4096 rays -> target 2^18/32 = 8192
    # rays, but budget still 1.0 at 512 steps -> 8192*512*1.0 = 4.2M slots > 2^21 cap
    tracer = PackedRFTracer(num_steps=512, compaction=1.0)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=False,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    t._prev_num_samples = 32.0 * 4096
    t.calc_adaptive_rays(4096)
    assert t.train_dataset.transform.num_samples == 4096, \
        "ray growth must be clamped to max_compacted_samples / (steps * budget)"

    # once the budget has shrunk, the same measurement may grow rays
    t.pipeline = _FakePipeline(tracer.replace(compaction=0.0625))
    t.calc_adaptive_rays(4096)
    assert t.train_dataset.transform.num_samples == 8192


def test_adaptive_compaction_growth_refused_past_cap():
    tracer = PackedRFTracer(num_steps=512, compaction=0.25)
    t = _bare_trainer(tracer, 8192, adaptive_compaction=True,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    # measured valid fraction 1.0 at 8192 rays x 512 steps wants budget 1.0, but the cap
    # allows only 2^21/(8192*512) = 0.5
    t._prev_num_samples = 1.0 * 8192 * 512
    t.calc_adaptive_compaction(8192)
    assert t.pipeline.tracer.compaction == pytest.approx(0.5)

    # an already-at-cap budget is kept (refusal path: no retune, no recompile churn)
    t._prev_num_samples = 1.0 * 8192 * 512
    t.calc_adaptive_compaction(8192)
    assert t.pipeline.tracer.compaction == pytest.approx(0.5)


def test_adaptive_compaction_no_oscillation_at_bucket_edge():
    # Regression (lego-proxy headline run): per-view fractions 0.0207-0.0221 sit right at
    # the 0.0312-bucket edge (0.0312/1.5 = 0.0208). The 5% grow deadband was narrower than
    # the ~7% view variance, so the budget ping-ponged 0.0312<->0.0625 every shrink window.
    # With the 15% band the budget must stay put for ANY frac sequence inside that range.
    tracer = PackedRFTracer(num_steps=512, compaction=0.03125)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=True,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    total = 4096 * 512
    fracs = [0.0207, 0.0215, 0.0221, 0.0210, 0.0218, 0.0221, 0.0209] * 10
    for f in fracs:
        t._prev_num_samples = f * total
        t.calc_adaptive_compaction(4096)
        assert t.pipeline.tracer.compaction == pytest.approx(0.03125), \
            f"budget moved at frac={f} (oscillation regression)"

    # a REAL spike (unpruned region opens up) must still grow immediately
    # (round 4: buckets are half-octave — 0.06*1.304 = 0.078 -> 2^-3.5)
    t._prev_num_samples = 0.06 * total
    t.calc_adaptive_compaction(4096)
    assert t.pipeline.tracer.compaction == pytest.approx(2.0 ** -3.5)


def test_adaptive_compaction_no_oscillation_at_high_view_variance():
    # Regression (lego-proxy headline r3c): per-view fractions swing 0.0205<->0.0258 (26%
    # variance). The 15% grow deadband alone still ping-ponged 0.0312<->0.0625 every ~70 s
    # (each flip a full recompile): a low-view shrink WINDOW fit one bucket down, then the
    # next high view re-grew. The SHRINK_MARGIN (1.3x) separates the thresholds ~1.5x:
    # once grown (round 4 half-octave buckets: 0.0258*1.304 = 0.0336 -> 2^-4.5 = 0.0442),
    # windows maxing at 0.0258 (0.0258*1.95 = 0.050 -> bucket 0.0625 > 0.0442) must NOT
    # shrink — the budget settles at 0.0442 and never flips again.
    tracer = PackedRFTracer(num_steps=512, compaction=0.03125)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=True,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    total = 4096 * 512
    retunes = []
    orig_refresh = t.refresh_pipeline

    def _counting_refresh(p):
        retunes.append(p.tracer.compaction)
        orig_refresh(p)
    t.refresh_pipeline = _counting_refresh

    # alternate low/high views, including all-low stretches longer than the shrink window
    fracs = ([0.0205, 0.0258, 0.0211, 0.0243] * 20
             + [0.0205, 0.0207, 0.0209] * 40       # 120 consecutive low views
             + [0.0258, 0.0205] * 20)
    for f in fracs:
        t._prev_num_samples = f * total
        t.calc_adaptive_compaction(4096)
    assert t.pipeline.tracer.compaction == pytest.approx(2.0 ** -4.5)
    assert len(retunes) == 1, \
        f"budget must settle after one grow, saw retunes: {retunes}"

    # a genuine sustained drop (e.g. after pruning) must still shrink: fractions at
    # 0.009 fit the 2^-5.5 bucket even with the 1.3x margin (0.009*1.95 = 0.0176 -> 0.0221)
    for _ in range(t.FRAC_WINDOW_STEPS + 1):
        t._prev_num_samples = 0.009 * total
        t.calc_adaptive_compaction(4096)
    assert t.pipeline.tracer.compaction == pytest.approx(2.0 ** -5.5)


def test_compaction_shrink_is_cost_aware():
    """VERDICT r4 #8: a compaction SHRINK (pure perf, zero quality effect) only fires
    when the measured per-step saving amortizes the measured recompile cost over the
    remaining steps with 2x margin — on the remote-TPU tunnel a retune recompile is
    3-8 min and half-octave shrink savings often never pay it back."""
    tracer = PackedRFTracer(num_steps=512, compaction=0.125)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=True,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    t.iterations_per_epoch = 100
    t.max_epochs = 100
    t.epoch, t.iteration = 1, 0   # total_iterations = 0: whole run remains
    t._step_wall_ema = 0.7        # flagship-like step
    t._retune_cost_ema = 240.0    # tunnel recompile: 4 min

    # late in the run the same shrink cannot amortize -> refused
    t.epoch = 99
    assert not t._shrink_pays_off(0.125, 0.0625), \
        "a 4-min recompile cannot amortize over ~100 remaining steps"

    # early in the run, halving the budget saves ~0.7*0.7/2 s/step over ~10k steps
    t.epoch = 1
    assert t._shrink_pays_off(0.125, 0.0625)

    # tiny (half-octave-style) shrinks save too little even early
    assert not t._shrink_pays_off(0.125, 0.118), \
        "a ~5% slot saving must not trigger a 4-min recompile"

    # with no recompile measurement yet, the prior (20 steps/compile) applies and a
    # big early shrink still goes through
    t._retune_cost_ema = None
    assert t._shrink_pays_off(0.125, 0.0625)


def test_retune_triggers_immediate_checkpoint():
    """Round 5: tunnel wedges cluster at the post-retune recompile, and a watchdog
    relaunch from the periodic (pre-retune) checkpoint re-pays every retune since that
    save (~4 min each). A tuner change to the compiled step configuration (ray bucket or
    compaction budget) must checkpoint immediately; an unchanged configuration must not
    re-save every window."""
    tracer = PackedRFTracer(num_steps=512, compaction=0.25)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=False,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21,
                      checkpoint_every=5)
    t._ckpt_shapes_seen = {t._step_shape()}
    saves = []
    t.save_training_state = lambda: saves.append(t._step_shape())
    total = 4096 * 512

    # steady window (frac 0.10 re-buckets rays to the same 4096): no retune -> no save
    t._prev_num_samples = 0.10 * total
    t.calc_adaptive_rays(4096)
    assert t._step_shape() == (4096, 0.25) and saves == []

    # frac 0.22 re-buckets rays 4096 -> 2048: a NEVER-compiled step shape -> exactly one
    # immediate save, capturing the new shape
    t._prev_num_samples = 0.22 * total
    t.calc_adaptive_rays(4096)
    assert len(saves) == 1 and saves[0] == (2048, 0.25)

    # the next identical window must not save again
    t._prev_num_samples = 0.22 * total
    t.calc_adaptive_rays(4096)
    assert len(saves) == 1

    # a flip BACK to an already-compiled shape is a jit-cache hit — no compile at risk,
    # no save — and so is every later oscillation between the two buckets (regression:
    # the ray bucket straddling a po2 edge across views flooded ~6 saves/min on the live
    # flagship run)
    for frac in (0.10, 0.22, 0.10, 0.22):
        t._prev_num_samples = frac * total
        t.calc_adaptive_rays(4096)
    assert len(saves) == 1, "oscillation between seen shapes must not checkpoint"

    # a budget change to a fresh shape still saves (the compaction dimension)
    t.refresh_pipeline(t.pipeline.replace(tracer.replace(compaction=0.125)))
    t._prev_num_samples = 0.10 * total
    t.calc_adaptive_rays(4096)
    assert len(saves) == 2 and saves[1][1] == 0.125

    # with checkpointing disabled the hook is a no-op
    t.cfg = ConfigMultiviewTrainer(adaptive_compaction=False, checkpoint_every=-1,
                                   target_sample_size=2 ** 18,
                                   max_compacted_samples=2 ** 21)
    t._prev_num_samples = 0.9 * total
    t.calc_adaptive_rays(4096)
    assert len(saves) == 2


def test_compaction_grow_reversing_shrink_blacklists_reshrink():
    """Anti-flap (round 5: the r5-flagship-fb run ping-ponged 0.125<->0.177<->0.25 for
    8 of its 15 retunes, ~21 min of tunnel recompiles). A grow that reverses a recent
    shrink proves the shrink window under-sampled the true per-view variance: growth
    still fires immediately (truncation hurts quality) but shrinking back below that
    level is blacklisted for a long cooldown, so the pair can flip at most once."""
    tracer = PackedRFTracer(num_steps=512, compaction=0.25)
    t = _bare_trainer(tracer, 4096, adaptive_compaction=True,
                      target_sample_size=2 ** 18, max_compacted_samples=2 ** 21)
    total = 4096 * 512
    retunes = []
    orig_refresh = t.refresh_pipeline

    def _counting_refresh(p):
        retunes.append(p.tracer.compaction)
        orig_refresh(p)
    t.refresh_pipeline = _counting_refresh

    def step(f):
        t._prev_num_samples = f * total
        t.calc_adaptive_compaction(4096)
        t.iteration += 1
        if t.iteration >= t.iterations_per_epoch:
            t.iteration = 0
            t.epoch += 1

    # fb-run shape: a low window shrinks 0.25 -> 0.177, then one high view re-grows,
    # then the same low window recurs — WITHOUT the blacklist this repeats forever
    low, high = 0.085, 0.20   # 0.085*1.95=0.166 -> bucket 0.177; 0.20*1.304 -> 0.354
    for _ in range(t.FRAC_WINDOW_STEPS + 1):
        step(low)
    assert t.pipeline.tracer.compaction == pytest.approx(2.0 ** -2.5)  # shrank
    step(high)                                # reversal grow (0.354 bucket > 0.25)
    grown = t.pipeline.tracer.compaction
    assert grown > 2.0 ** -2.5
    n_before = len(retunes)
    for _ in range(8 * t.FRAC_WINDOW_STEPS):  # low stretch inside the cooldown
        step(low)
    assert t.pipeline.tracer.compaction == pytest.approx(grown), \
        f"re-shrink fired inside the blacklist cooldown: {retunes}"
    assert len(retunes) == n_before
    # after the cooldown expires the shrink may fire again (sustained real drop)
    for _ in range(9 * t.FRAC_WINDOW_STEPS):
        step(low)
    assert t.pipeline.tracer.compaction < grown, \
        "a sustained drop must still shrink once the cooldown expires"
