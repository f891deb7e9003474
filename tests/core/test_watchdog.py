"""Wedge survival: heartbeat watchdog + atomic resume (VERDICT r4 weak #1).

The remote-TPU tunnel can wedge mid-RPC (the client blocks forever at ~2% CPU) — three
independent events in round 4 nulled the bench artifact and a flagship ledger run. These
tests prove the supervisor kills a stalled child by process group and relaunches it, and
that a relaunched trainer resumes from the last atomic checkpoint with counters, params,
optimizer state and adaptive-tuner state intact."""

import json
import os
import sys
import textwrap

import numpy as np
import pytest
import jax

from tools.watchdog import supervise

pytestmark = pytest.mark.smoke


def _write_script(tmp_path, body):
    path = tmp_path / "child.py"
    path.write_text(textwrap.dedent(body))
    return str(path)


def test_supervise_kills_stalled_child_and_relaunches(tmp_path):
    """Attempt 1 wedges (never stamps the heartbeat); the supervisor must SIGKILL it at
    staleness and relaunch; attempt 2 exits cleanly."""
    marker = str(tmp_path / "first_attempt_ran")
    script = _write_script(tmp_path, f"""
        import os, sys, time
        marker = {marker!r}
        hb = os.environ["WISP_HEARTBEAT_FILE"]
        # stamp at boot so staleness measures in-run wedges, not interpreter startup
        # (this contended single-core box can take >5 s just to reach main)
        open(hb, "w").write('{{"phase": "boot"}}')
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            time.sleep(300)   # simulated tunnel wedge: no heartbeat, never returns
        open(hb, "w").write('{{"phase": "ok"}}')
        sys.exit(0)
    """)
    hb = str(tmp_path / "hb.json")
    # stall_s covers interpreter boot under full CPU contention (1-core box with a
    # training host process competing: a trivial child has been observed to need >5 s)
    rc = supervise([sys.executable, script], hb, stall_s=15.0, poll_s=0.2, max_restarts=2)
    assert rc == 0
    assert os.path.exists(marker), "first attempt should have launched"
    assert json.load(open(hb))["phase"] == "ok"


def test_supervise_gives_up_after_max_restarts(tmp_path):
    script = _write_script(tmp_path, """
        import time
        time.sleep(300)
    """)
    hb = str(tmp_path / "hb.json")
    rc = supervise([sys.executable, script], hb, stall_s=1.0, poll_s=0.2, max_restarts=1)
    assert rc == 75  # EX_TEMPFAIL: restarts exhausted


def test_supervise_heartbeat_keeps_child_alive(tmp_path):
    """A slow-but-alive child (stamping between long ops) must NOT be killed."""
    script = _write_script(tmp_path, """
        import os, sys, time
        hb = os.environ["WISP_HEARTBEAT_FILE"]
        # run LONGER than stall_s in total, stamping between ops — survival proves the
        # stamps extend the deadline (not merely that the child finished early)
        for i in range(40):
            open(hb, "w").write('{"i": %d}' % i)
            time.sleep(0.5)
        sys.exit(0)
    """)
    hb = str(tmp_path / "hb.json")
    # stall_s > boot-under-contention (see above) + the longest stamp gap (0.5 s)
    rc = supervise([sys.executable, script], hb, stall_s=15.0, poll_s=0.2, max_restarts=0)
    assert rc == 0


def test_supervise_blocked_probe_extends_instead_of_killing(tmp_path):
    """Wedge-vs-compile discrimination (round 5: a post-resume recompile ran past the
    15-min stall and the watchdog killed a healthy compiling child). Remote compiles are
    serialized backend-side, so a fresh-process probe BLOCKS during a legitimate compile:
    a blocked probe must extend the stall window instead of killing. Here the child stamps
    once, goes silent for ~3x stall_s (the 'long compile'), then finishes — with the
    blocked probe it must survive with ZERO kills."""
    script = _write_script(tmp_path, """
        import os, sys, time
        hb = os.environ["WISP_HEARTBEAT_FILE"]
        open(hb, "w").write('{"phase": "step"}')
        time.sleep(9)     # long compile: silent ~3x the 3-s stall window
        open(hb, "w").write('{"phase": "done"}')
        sys.exit(0)
    """)
    hb = str(tmp_path / "hb.json")
    rc = supervise([sys.executable, script], hb, stall_s=3.0, poll_s=0.2, max_restarts=0,
                   probe_cmd=["sleep", "60"], probe_timeout_s=0.3, max_extends=5)
    assert rc == 0, "a blocked probe must shield a legitimately compiling child"
    assert json.load(open(hb))["phase"] == "done"


def test_supervise_healthy_probe_confirms_wedge_and_kills(tmp_path):
    """The probe completing fast means the backend serves fresh clients — the silent
    child is truly wedged and must be killed+relaunched despite max_extends remaining."""
    marker = str(tmp_path / "first_attempt_ran")
    script = _write_script(tmp_path, f"""
        import os, sys, time
        marker = {marker!r}
        hb = os.environ["WISP_HEARTBEAT_FILE"]
        open(hb, "w").write('{{"phase": "boot"}}')
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            time.sleep(300)   # true wedge
        open(hb, "w").write('{{"phase": "ok"}}')
        sys.exit(0)
    """)
    hb = str(tmp_path / "hb.json")
    rc = supervise([sys.executable, script], hb, stall_s=15.0, poll_s=0.2, max_restarts=2,
                   probe_cmd=["true"], probe_timeout_s=5.0, max_extends=5)
    assert rc == 0
    assert os.path.exists(marker)
    assert json.load(open(hb))["phase"] == "ok"


def test_supervise_blocked_probe_extends_are_bounded(tmp_path):
    """A dead backend also blocks the probe; extends are capped so the supervisor still
    kills eventually rather than stalling forever."""
    script = _write_script(tmp_path, """
        import os, time
        open(os.environ["WISP_HEARTBEAT_FILE"], "w").write('{"phase": "boot"}')
        time.sleep(300)
    """)
    hb = str(tmp_path / "hb.json")
    rc = supervise([sys.executable, script], hb, stall_s=2.0, poll_s=0.2, max_restarts=0,
                   probe_cmd=["sleep", "60"], probe_timeout_s=0.3, max_extends=2)
    assert rc == 75  # extends exhausted -> kill -> restarts exhausted


def _make_trainer(tmp_path, run_name, seed=0, max_epochs=4, resume=None):
    from app.image.main_image import make_test_image
    from wisp_tpu.models.grids import HashGrid
    from wisp_tpu.models.nefs import ImageNeuralField
    from wisp_tpu.models.pipeline import Pipeline
    from wisp_tpu.datasets import ImageDataset
    from wisp_tpu.trainers import ImageTrainer, ConfigBaseTrainer
    from wisp_tpu.trainers.tracker import Tracker, ConfigTracker

    img_path = str(tmp_path / "img.png")
    if not os.path.exists(img_path):
        make_test_image(img_path, size=64)
    ds = ImageDataset(img_path, num_pixels_per_image=512)
    grid = HashGrid.from_geometric(feature_dim=2, num_lods=4, codebook_bitwidth=10,
                                   min_grid_res=4, max_grid_res=32, coord_dim=2,
                                   key=jax.random.PRNGKey(seed))
    nef = ImageNeuralField(grid=grid, hidden_dim=32, key=jax.random.PRNGKey(seed + 1))
    cfg = ConfigBaseTrainer(max_epochs=max_epochs, render_every=-1, save_every=-1,
                            valid_every=-1, exp_name="resume-test",
                            checkpoint_every=1, resume=resume)
    tracker = Tracker(ConfigTracker(tensorboard=False, log_dir=str(tmp_path / "logs"),
                                    run_name=run_name), "resume-test")
    return ImageTrainer(cfg=cfg, pipeline=Pipeline(nef=nef), train_dataset=ds,
                        tracker=tracker)


def test_resume_auto_continues_from_mid_run_checkpoint(tmp_path):
    # simulate a watchdog kill after epoch 2 of 4: run two epochs, abandon the process
    t1 = _make_trainer(tmp_path, "runA")
    t1.is_optimization_running = True
    while t1.is_optimization_running and t1.epoch <= 2:
        t1.iterate()
    assert t1.epoch == 3  # two epochs completed, counters advanced, state checkpointed
    ckpt = os.path.join(t1.tracker.log_dir, "train_state.pkl")
    assert os.path.exists(ckpt)
    import pickle
    with open(ckpt, "rb") as fh:
        saved = pickle.load(fh)

    # relaunch: same command, resume=auto, pinned run_name -> same log dir
    t2 = _make_trainer(tmp_path, "runA", seed=9, resume="auto")
    t2.is_optimization_running = True
    t2.pre_training()  # resume happens here
    t2._pre_training_done = True
    assert t2.epoch == 3 and t2.iteration == 0
    k = sorted(saved["diff"].keys())[0]
    np.testing.assert_array_equal(np.asarray(t2._diff[k]), np.asarray(saved["diff"][k]))
    # and it trains to completion from there
    while t2.is_optimization_running:
        t2.iterate()
    assert t2.epoch == 4 and not t2.is_optimization_running

    # a third relaunch of the COMPLETED run must not retrain (done marker honored)
    t3 = _make_trainer(tmp_path, "runA", seed=17, resume="auto")
    t3.train()
    assert t3.epoch == 4


def test_resume_auto_without_checkpoint_starts_fresh(tmp_path):
    t = _make_trainer(tmp_path, "runB", resume="auto", max_epochs=1)
    t.train()  # must not raise: auto with nothing to resume = fresh start
    assert t.epoch == 1


def test_supervise_relaunches_on_crash(tmp_path):
    """Round 5 (r5-flagship-noes): a transient tunnel fault surfaces as a CRASH
    (remote_compile HTTP 500 -> JaxRuntimeError, rc=1), not a hang — the supervisor must
    relaunch from the checkpoint exactly as for a stall kill. A clean rc=0 still returns
    immediately, and a persistent crash burns max_restarts and exits 75."""
    marker = str(tmp_path / "crashed_once")
    script = _write_script(tmp_path, f"""
        import os, sys
        marker = {marker!r}
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            raise RuntimeError("transient tunnel fault")
        sys.exit(0)
    """)
    hb = str(tmp_path / "hb.json")
    rc = supervise([sys.executable, script], hb, stall_s=60.0, poll_s=0.2,
                   max_restarts=2)
    assert rc == 0
    assert os.path.exists(marker)

    # persistent crash: attempts exhausted -> 75
    script2 = _write_script(tmp_path, "raise RuntimeError('deterministic bug')")
    rc = supervise([sys.executable, script2], hb, stall_s=60.0, poll_s=0.2,
                   max_restarts=1)
    assert rc == 75


def test_render_chunk_clamped_by_memory_cap():
    """Round 5 (r5-flagship-noes): the epoch-25 validation OOM'd HBM — 32768-ray render
    chunk x 512 steps x budget 0.25 = 4.2M compacted slots (19.05 GB / 15.75 GB chip).
    render_view must clamp its chunk so chunk*steps*budget <= max_compacted_samples."""
    import types
    from wisp_tpu.tracers import PackedRFTracer
    from wisp_tpu.trainers.multiview_trainer import (ConfigMultiviewTrainer,
                                                     MultiviewTrainer)

    t = MultiviewTrainer.__new__(MultiviewTrainer)
    t.cfg = ConfigMultiviewTrainer(max_compacted_samples=2 ** 21)
    pipe = types.SimpleNamespace(tracer=PackedRFTracer(num_steps=512, compaction=0.25))
    # 2^21/(512*0.25) = 16384
    assert t._clamp_render_chunk(32768, pipe) == 16384
    # smaller budgets allow the full chunk
    pipe2 = types.SimpleNamespace(tracer=PackedRFTracer(num_steps=512, compaction=0.0625))
    assert t._clamp_render_chunk(32768, pipe2) == 32768
    # no compaction -> no padded-slot blowup -> untouched
    pipe3 = types.SimpleNamespace(tracer=PackedRFTracer(num_steps=512, compaction=0.0))
    assert t._clamp_render_chunk(32768, pipe3) == 32768
    # never clamp below 1024
    pipe4 = types.SimpleNamespace(tracer=PackedRFTracer(num_steps=2048, compaction=1.0))
    assert t._clamp_render_chunk(32768, pipe4) == 1024


def test_lease_written_while_supervising_and_cleared_on_exit(tmp_path, monkeypatch):
    """A supervised run advertises {supervisor, child} pids in the chip-lease file so a
    higher-priority measurement (the driver's end-of-round bench) can preempt it
    pid-targeted; every supervise() exit path must clear the lease."""
    import tools.watchdog as wd
    lease = str(tmp_path / "lease.json")
    monkeypatch.setattr(wd, "LEASE_FILE", lease)
    seen = str(tmp_path / "lease_seen.json")
    hb = str(tmp_path / "hb.json")
    script = _write_script(tmp_path, f"""
        import json, os, shutil, time
        open(os.environ["WISP_HEARTBEAT_FILE"], "w").write("x")
        for _ in range(50):
            if os.path.exists({lease!r}):
                shutil.copy({lease!r}, {seen!r})
                break
            time.sleep(0.1)
    """)
    rc = wd.supervise([sys.executable, script], hb, stall_s=30.0, poll_s=0.2,
                      max_restarts=0)
    assert rc == 0
    content = json.load(open(seen))
    assert content["supervisor"] == os.getpid()
    assert isinstance(content["child"], int)
    assert not os.path.exists(lease)  # cleared on clean exit


def test_bench_preempts_leaseholder_pid_targeted(tmp_path, monkeypatch):
    """bench.py._preempt_leaseholder kills the lease's supervisor+child (and only
    processes whose /proc cmdline still matches) then removes the lease."""
    import signal
    import subprocess
    import bench

    # a fake supervised child: sleeps forever in its own session
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"],
                             start_new_session=True)
    # an INNOCENT process listed as supervisor: its cmdline is not a watchdog, so the
    # pid-reuse guard must leave it alive rather than kill a recycled pid
    innocent = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"])

    # on this contended single-core box the children may not have exec'd yet — wait
    # until /proc cmdline shows the real argv or the cmdline guard will skip them
    def _wait_exec(pid):
        import time as _t
        for _ in range(100):
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    if b"time.sleep" in fh.read():
                        return
            except OSError:
                return
            _t.sleep(0.05)

    _wait_exec(child.pid)
    _wait_exec(innocent.pid)
    lease = tmp_path / "lease.json"
    lease.write_text(json.dumps({"supervisor": innocent.pid, "child": child.pid}))
    monkeypatch.setenv("WISP_CHIP_LEASE", str(lease))
    bench._preempt_leaseholder()
    try:
        assert child.wait(timeout=10) != 0  # SIGKILLed (cmdline matches 'python')
        assert innocent.poll() is None      # guard skipped the non-watchdog pid
    finally:
        for p in (child, innocent):
            if p.poll() is None:
                p.kill()
    assert not lease.exists()
    # BENCH_PREEMPT=0 disables eviction
    lease.write_text(json.dumps({"supervisor": None, "child": None}))
    monkeypatch.setenv("BENCH_PREEMPT", "0")
    bench._preempt_leaseholder()
    assert lease.exists()
