"""Wedge watchdog: supervise a long TPU run with heartbeat-based kill + relaunch.

The remote-TPU tunnel can wedge mid-RPC — the client blocks forever at ~2% CPU while the
backend happily serves fresh clients (three independent events in round 4: the driver's
bench, the judge's bench retry, flagship ledger run 3 — VERDICT r4 weak #1). Detection from
*inside* the wedged process is impossible (the blocked RPC never returns), so survival is a
supervisor's job:

* the child process stamps ``WISP_HEARTBEAT_FILE`` at every step boundary
  (``wisp_tpu/trainers/base_trainer.py _touch_heartbeat``) and per render chunk;
* this supervisor launches the child in its own process group, watches the stamp, and on
  staleness (default 15 min — longer than any legitimate gap: a tunnel retune recompile is
  3-8 min, a prune ~12 s; shorter than the observed 27-min wedge) SIGKILLs the *group* and
  relaunches the same command. Training commands resume via ``--trainer.resume auto`` with a
  pinned ``--tracker.run-name``, so the relaunch continues from the last complete atomic
  checkpoint in the same run dir.

Usage:
    python tools/watchdog.py [--stall 900] [--max-restarts 3] [--heartbeat PATH] -- \
        python app/nerf/main_nerf.py --config ... \
        --trainer.resume auto --trainer.checkpoint-every 2 --tracker.run-name myrun

Exit code: the child's on clean exit; 75 (EX_TEMPFAIL) when restarts are exhausted.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import tempfile
import time


# Chip lease: the single tunneled chip is a mutually-exclusive resource. Every supervised
# long run advertises {supervisor pid, child pid} here so a higher-priority measurement
# (the driver's end-of-round `bench.py`) can preempt it pid-targeted — supervisor first,
# so the kill is not answered with a relaunch. See bench.py `_preempt_leaseholder`.
LEASE_FILE = os.environ.get("WISP_CHIP_LEASE", "/tmp/wisp_chip_lease.json")


def _write_lease(child_pid: int) -> None:
    try:
        import json
        with open(LEASE_FILE, "w") as fh:
            json.dump({"supervisor": os.getpid(), "child": int(child_pid),
                       "ts": time.time()}, fh)
    except OSError:
        pass


def _clear_lease() -> None:
    """Remove the lease only if it still names this supervisor."""
    try:
        import json
        with open(LEASE_FILE) as fh:
            if json.load(fh).get("supervisor") == os.getpid():
                os.unlink(LEASE_FILE)
    except (OSError, ValueError):
        pass


def _kill_group(proc: subprocess.Popen, logf) -> None:
    """SIGKILL the child's whole process group by pgid (never by name pattern)."""
    try:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except (ProcessLookupError, PermissionError) as e:
        logf(f"[watchdog] kill pgid failed ({e}); killing pid directly")
        try:
            proc.kill()
        except ProcessLookupError:
            pass
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        logf("[watchdog] child did not reap within 30 s after SIGKILL")


# A fresh-process tiny jit: on the remote-TPU backend compiles are serialized, so this
# BLOCKS (→ timeout) while a legitimate long compile holds the slot, and completes in
# seconds during a socket wedge (round 4 measured the backend serving fresh clients fine
# for the whole 27-min wedge). That asymmetry is the wedge-vs-compile discriminator.
DEFAULT_PROBE = [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jax.jit(lambda x: x + 1)(jnp.ones(()))))"]


def _backend_healthy(probe_cmd, timeout_s: float, logf) -> bool:
    """True iff a fresh process finishes the probe within ``timeout_s`` — the backend is
    serving new clients, so a silent child is wedged, not compiling."""
    try:
        rc = subprocess.run(list(map(str, probe_cmd)), timeout=timeout_s,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL).returncode
    except subprocess.TimeoutExpired:
        logf(f"[watchdog] probe timed out after {timeout_s:.0f} s — compile slot busy")
        return False
    except OSError as e:
        logf(f"[watchdog] probe failed to launch ({e}) — treating as inconclusive")
        return False
    if rc != 0:
        logf(f"[watchdog] probe exited rc={rc} — treating as inconclusive")
        return False
    return True


def supervise(cmd, heartbeat: str, stall_s: float = 900.0, max_restarts: int = 3,
              poll_s: float = 5.0, env=None, logf=None, stdout=None,
              probe_cmd=None, probe_timeout_s: float = 120.0,
              max_extends: int = 3) -> int:
    """Run ``cmd`` under heartbeat supervision; kill + relaunch on staleness.

    Returns the child's exit code, or 75 when ``max_restarts`` relaunches were consumed
    without a clean exit. ``heartbeat`` staleness is measured against the file's mtime
    (or the launch time until the first stamp appears).

    ``probe_cmd``: before a staleness kill, run this command in a fresh process. If it
    completes within ``probe_timeout_s`` the backend is healthy → the silent child is
    truly wedged → kill. If it blocks/fails, the (serialized) compile slot is busy — the
    child is most likely inside a long legitimate compile (post-resume recompiles can
    exceed the stall window) → extend the window, at most ``max_extends`` times per
    launch, then kill anyway so a dead backend cannot stall the supervisor forever."""
    logf = logf or (lambda m: print(m, file=sys.stderr, flush=True))
    env = dict(env or os.environ)
    env["WISP_HEARTBEAT_FILE"] = heartbeat
    try:
        return _supervise_loop(cmd, stall_s, max_restarts, poll_s, env, logf, stdout,
                               probe_cmd, probe_timeout_s, max_extends, heartbeat)
    finally:
        _clear_lease()  # every exit path releases the chip lease


def _supervise_loop(cmd, stall_s, max_restarts, poll_s, env, logf, stdout,
                    probe_cmd, probe_timeout_s, max_extends, heartbeat) -> int:
    attempt = 0
    while True:
        launch_t = time.time()
        logf(f"[watchdog] launch attempt {attempt + 1}: {' '.join(map(str, cmd))}")
        proc = subprocess.Popen(list(map(str, cmd)), env=env, start_new_session=True,
                                stdout=stdout, stderr=None)
        _write_lease(proc.pid)
        killed = False
        extends_used = 0
        extended_t = 0.0
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            try:
                last = os.path.getmtime(heartbeat)
            except OSError:
                last = launch_t
            last = max(last, launch_t, extended_t)
            if time.time() - last > stall_s:
                if (probe_cmd and extends_used < max_extends
                        and not _backend_healthy(probe_cmd, probe_timeout_s, logf)):
                    extends_used += 1
                    extended_t = time.time()
                    logf(f"[watchdog] heartbeat stale but the backend probe is blocked "
                         f"— child likely mid-compile; extending stall window "
                         f"({extends_used}/{max_extends})")
                    continue
                logf(f"[watchdog] heartbeat stale for {time.time() - last:.0f} s "
                     f"(> {stall_s:.0f}) — killing process group and relaunching")
                _kill_group(proc, logf)
                killed = True
                break
            time.sleep(poll_s)
        if not killed:
            if int(rc) == 0:
                logf("[watchdog] child exited rc=0")
                return 0
            # A CRASH also deserves a relaunch: transient tunnel faults surface as
            # exceptions (e.g. remote_compile HTTP 500 mid-run, round 5), not only as
            # hangs — resume-auto continues from the last atomic checkpoint exactly as
            # for a stall kill. Persistent (deterministic) crashes burn max_restarts
            # quickly and exit 75, so a real bug still fails loudly.
            logf(f"[watchdog] child exited rc={rc} — relaunching from the last "
                 "checkpoint")
        attempt += 1
        if attempt > max_restarts:
            logf(f"[watchdog] restarts exhausted ({max_restarts}) — giving up")
            return 75


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--stall", type=float, default=900.0,
                    help="seconds of heartbeat staleness before kill+relaunch")
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("--heartbeat", default=None,
                    help="heartbeat file path (default: a fresh temp file)")
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--probe", default="default",
                    help="pre-kill backend probe command (shell-split); 'default' = a "
                         "tiny fresh-process jit, 'none' disables the probe")
    ap.add_argument("--probe-timeout", type=float, default=120.0)
    ap.add_argument("--max-extends", type=int, default=3,
                    help="max stall-window extensions per launch while the probe is "
                         "blocked (a long compile holds the serialized compile slot)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to supervise")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (pass it after --)")
    hb = args.heartbeat or os.path.join(tempfile.gettempdir(),
                                        f"wisp_hb_{os.getpid()}.json")
    if args.probe == "none":
        probe = None
    elif args.probe == "default":
        probe = DEFAULT_PROBE
    else:
        import shlex
        probe = shlex.split(args.probe)
    return supervise(cmd, hb, stall_s=args.stall, max_restarts=args.max_restarts,
                     poll_s=args.poll, probe_cmd=probe,
                     probe_timeout_s=args.probe_timeout, max_extends=args.max_extends)


if __name__ == "__main__":
    sys.exit(main())
