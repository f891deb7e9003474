"""Extract the results-table row for a training run from its tfevents ledger.

Reads every ``events.out.tfevents.*`` in a run directory (a watchdog-relaunched run has
one file per attempt) and prints PSNR at the requested validation epochs, per-epoch wall
statistics, and the end-to-end wall (first event to last event, so compiles, validations
and restart gaps are included — the honest "how long did this run take" number).

Usage:
    python tools/run_table.py _results/logs/runs/nerf-hash-lego-proxy/r5-flagship-noes \
        [--epochs 25,50,75,100]

Prints a markdown fragment plus one JSON line (machine-readable for docs/bench tooling).
Counterpart evidence flow of the reference's tensorboard ledgers (its docs tables, e.g.
docs/pages/app_nerf.md:193-200, are read off the same scalars)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def read_scalars(run_dir: str):
    """{tag: [(wall_time, step, value)]} across ALL event files, time-sorted."""
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    out: dict = {}
    files = sorted(glob.glob(os.path.join(run_dir, "events.out.tfevents.*")))
    if not files:
        raise FileNotFoundError(f"no tfevents files under {run_dir}")
    for path in files:
        acc = EventAccumulator(path, size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            for ev in acc.Scalars(tag):
                out.setdefault(tag, []).append((ev.wall_time, ev.step, ev.value))
    for tag in out:
        out[tag].sort()
    return out, len(files)


def summarize(run_dir: str, epochs):
    scalars, n_files = read_scalars(run_dir)
    psnr = {step: val for _, step, val in scalars.get("validation/psnr", [])}
    epoch_ms = [val for _, _, val in scalars.get("time/elapsed_ms_per_epoch", [])]
    all_events = [wt for evs in scalars.values() for wt, _, _ in evs]
    losses = scalars.get("loss/total_loss", scalars.get("loss/rgb_loss", []))
    row = {
        "run_dir": run_dir,
        "psnr": {str(e): (round(psnr[e], 2) if e in psnr else None) for e in epochs},
        "epochs_trained": max((s for _, s, _ in losses), default=None),
        "s_per_epoch_median": round(sorted(epoch_ms)[len(epoch_ms) // 2] / 1000.0, 1)
        if epoch_ms else None,
        "s_per_epoch_sum": round(sum(epoch_ms) / 1000.0, 1) if epoch_ms else None,
        "wall_s_end_to_end": round(max(all_events) - min(all_events), 1)
        if all_events else None,
        "attempts": n_files,  # >1 means the watchdog relaunched (restart gaps included)
        "final_loss": round(losses[-1][2], 8) if losses else None,
        # erosion diagnostic: the signature is loss bottoming early then rising
        "loss_min_at_epoch": min(losses, key=lambda t: t[2])[1] if losses else None,
    }
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--epochs", default="25,50,75,100")
    args = ap.parse_args(argv)
    epochs = [int(e) for e in args.epochs.split(",")]

    header = ("| run | " + " | ".join(f"PSNR @{e}" for e in epochs)
              + " | s/epoch (med) | total wall | attempts |")
    print(header)
    print("|" + "---|" * (len(epochs) + 4))
    for run_dir in args.run_dirs:
        r = summarize(run_dir, epochs)
        wall = r["wall_s_end_to_end"]
        wall_str = f"{int(wall // 3600)}:{int(wall % 3600 // 60):02d}" if wall else "?"
        print(f"| {os.path.basename(run_dir.rstrip('/'))} | "
              + " | ".join(str(r["psnr"][str(e)] or "—") for e in epochs)
              + f" | {r['s_per_epoch_median']} | {wall_str} | {r['attempts']} |")
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
