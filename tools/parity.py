#!/usr/bin/env python
"""PSNR parity harness vs the reference's published benchmarks (VERDICT r1 #3).

Each named run mirrors a reference CI test / published table row bit-for-bit in
hyperparameters (reference tests/apps/test_nerf.py:14-176, docs/pages/app_nerf.md:128-209
— values captured in BASELINE.md). No lego/V8 data ships in this environment, so the
harness is ready-to-run: point it at a dataset and it trains, collects PSNR at the same
validation epochs, and prints a table next to the reference numbers with the +-0.5 dB
parity verdict (BASELINE.json target).

Usage:
    python tools/parity.py --list
    python tools/parity.py --run nerf_hash_quick --dataset-path /data/lego
    python tools/parity.py --run all --dataset-path /data/lego --v8-path /data/V8
    python tools/parity.py --run nerf_hash_quick --dataset-path /data/lego --json out.json

Exit code 1 if any completed run misses its CI floor (reference's own regression gates).
"""

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

# name -> spec. `overrides` mirror the reference CLI args exactly (file:line cited).
# `reference` = published PSNR@epoch (A6000, docs/pages/app_nerf.md); `floors` = the
# reference CI assertion floors (tests/apps/test_nerf.py).
RUNS = {
    "nerf_hash_quick": {
        "dataset": "lego",
        "config": "app/nerf/configs/nerf_hash.yaml",
        # reference tests/apps/test_nerf.py:14-36 (AdamW, mip 0, 512 steps, hidden 64)
        "overrides": ["--trainer.optimizer.constructor", "AdamW",
                      "--dataset.mip", "0",
                      "--tracer.num-steps", "512",
                      "--tracer.raymarch-type", "ray",
                      "--nef.hidden-dim", "64",
                      "--trainer.max-epochs", "200"],
        "reference": {100: 28.58, 200: 29.20, 300: 29.64},   # app_nerf.md:193-200
        "floors": {100: 28.3, 200: 28.9},                    # test_nerf.py:34-35
    },
    "nerf_hash_best": {
        "dataset": "lego",
        "config": "app/nerf/configs/nerf_hash.yaml",
        # reference tests/apps/test_nerf.py:40-61 (AdamW, 2048 steps, hidden 128)
        "overrides": ["--trainer.optimizer.constructor", "AdamW",
                      "--dataset.mip", "0",
                      "--tracer.num-steps", "2048",
                      "--tracer.raymarch-type", "ray",
                      "--nef.hidden-dim", "128",
                      "--trainer.max-epochs", "100"],
        "reference": {100: 31.05, 200: 31.96, 300: 32.36},   # app_nerf.md:184-192
        "floors": {100: 29.95},                              # test_nerf.py:60
    },
    "nerf_octree_lego": {
        "dataset": "lego",
        "config": "app/nerf/configs/nerf_octree.yaml",
        # reference tests/apps/test_nerf.py:89-110 (dense blas, mip 0, ray, hidden 64)
        "overrides": ["--dataset.mip", "0",
                      "--tracer.num-steps", "512",
                      "--tracer.raymarch-type", "ray",
                      "--nef.hidden-dim", "64",
                      "--trainer.max-epochs", "100"],
        "reference": {100: 28.72, 200: 29.39, 300: 29.70},   # app_nerf.md:150-157
        "floors": {100: 28.15},                              # test_nerf.py:109
    },
    "nerf_triplanar_lego": {
        "dataset": "lego",
        "config": "app/nerf/configs/nerf_triplanar.yaml",
        # reference tests/apps/test_nerf.py:135-155 (mip 2, voxel, hidden 128)
        "overrides": ["--dataset.mip", "2",
                      "--tracer.num-steps", "512",
                      "--tracer.raymarch-type", "voxel",
                      "--nef.hidden-dim", "128",
                      "--trainer.max-epochs", "100"],
        "reference": {100: 31.13, 200: 31.80, 300: 32.30},   # app_nerf.md:166-174
        "floors": {100: 30.4},                               # test_nerf.py:154
    },
    "nerf_codebook_v8": {
        "dataset": "v8",
        "config": "app/nerf/configs/nerf_codebook.yaml",
        # reference tests/apps/test_nerf.py:157-177 (RTMV, mip 2, 16 steps voxel, hid 128)
        "overrides": ["--dataset.constructor", "RTMVDataset",
                      "--dataset.mip", "2",
                      "--tracer.num-steps", "16",
                      "--tracer.raymarch-type", "voxel",
                      "--nef.hidden-dim", "128",
                      "--trainer.max-epochs", "100"],
        "reference": {100: 27.71, 200: 28.27, 300: 28.49},   # app_nerf.md:175-183
        "floors": {100: 27.4},                               # test_nerf.py:176
    },
}


def run_one(name: str, dataset_path: str, extra_overrides=None, valid_every: int = 100):
    """Train one parity config in-process; returns {epoch: psnr} for every validation."""
    spec = RUNS[name]
    from app.nerf.main_nerf import main
    from wisp_tpu.trainers.multiview_trainer import MultiviewTrainer

    collected = {}
    orig_validate = MultiviewTrainer.validate

    def spy_validate(self):
        out = orig_validate(self)
        metrics = out if isinstance(out, dict) else {}
        if "psnr" in metrics:
            collected[int(self.epoch)] = float(metrics["psnr"])
        return out

    argv = (["--config", os.path.join(REPO, spec["config"]),
             "--dataset.dataset-path", dataset_path,
             "--trainer.valid-every", str(valid_every),
             "--trainer.save-every", "-1",
             "--trainer.render-every", "-1",
             "--trainer.exp-name", f"parity-{name}",
             "--tracker.tensorboard", "false"]
            + spec["overrides"] + list(extra_overrides or []))

    MultiviewTrainer.validate = spy_validate
    try:
        result = main(argv=argv)
    finally:
        MultiviewTrainer.validate = orig_validate
    if not collected and isinstance(result, dict) and "psnr" in result:
        collected[-1] = float(result["psnr"])
    return collected


def report(name: str, collected: dict):
    """Print the parity row; returns False if a CI floor was missed."""
    spec = RUNS[name]
    ok = True
    print(f"\n== {name} ({spec['config']}, dataset: {spec['dataset']}) ==")
    print(f"{'epoch':>6} {'ours (dB)':>10} {'reference':>10} {'delta':>7} "
          f"{'CI floor':>9} verdict")
    for epoch, ref in sorted(spec["reference"].items()):
        ours = collected.get(epoch)
        floor = spec["floors"].get(epoch)
        if ours is None:
            print(f"{epoch:>6} {'—':>10} {ref:>10.2f} {'—':>7} "
                  f"{floor if floor is not None else '—':>9} UNVERIFIED (no data / "
                  f"epoch not reached)")
            continue
        delta = ours - ref
        verdict = "PARITY" if abs(delta) <= 0.5 else ("ABOVE" if delta > 0 else "BELOW")
        if floor is not None and ours <= floor:
            verdict += " / CI-FLOOR MISS"
            ok = False
        print(f"{epoch:>6} {ours:>10.2f} {ref:>10.2f} {delta:>+7.2f} "
              f"{floor if floor is not None else '—':>9} {verdict}")
    return ok


def main_cli():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--list", action="store_true", help="list runs and exit")
    ap.add_argument("--run", default=None, help="run name or 'all'")
    ap.add_argument("--dataset-path", default=None, help="nerf-synthetic scene dir (lego)")
    ap.add_argument("--v8-path", default=None, help="RTMV V8 scene dir")
    ap.add_argument("--valid-every", type=int, default=100)
    ap.add_argument("--json", default=None, help="also dump collected metrics to this file")
    ap.add_argument("--override", action="append", default=[],
                    help="extra CLI override forwarded to the app (repeatable)")
    args = ap.parse_args()

    if args.list or not args.run:
        print("parity runs (reference hyperparameters mirrored exactly):")
        for name, spec in RUNS.items():
            floors = ", ".join(f"PSNR@{e}>{f}" for e, f in spec["floors"].items())
            print(f"  {name:22s} dataset={spec['dataset']:4s} {spec['config']}  CI: {floors}")
        print("\nexample: python tools/parity.py --run nerf_hash_quick "
              "--dataset-path /data/lego")
        return 0

    names = list(RUNS) if args.run == "all" else [args.run]
    all_ok, dumped = True, {}
    for name in names:
        spec = RUNS[name]
        path = args.v8_path if spec["dataset"] == "v8" else args.dataset_path
        if not path:
            print(f"-- {name}: SKIPPED (no --{'v8-path' if spec['dataset'] == 'v8' else 'dataset-path'} given) — UNVERIFIED")
            continue
        collected = run_one(name, path, extra_overrides=args.override,
                            valid_every=args.valid_every)
        dumped[name] = collected
        all_ok &= report(name, collected)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(dumped, fh, indent=2)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main_cli())
