"""A/B probe: does long-horizon training degrade with the stochastic single-corner
backward (and/or pruning cadence)? Mirrors tests/apps/test_nerf.py lego-proxy config at
40 epochs with validations every 10 and an 8x-accelerated prune cadence. CPU-only
(single device forced via jax_platforms), results to JSON.

Context: round-4 TPU headline run showed PSNR 29.12 @25 -> 27.00 @50 with train loss
creeping up from ~epoch 15; suspects are stochastic-backward gradient noise vs
prune-decay erosion."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from app.nerf.main_nerf import main  # noqa: E402

BASE = [
    "--dataset.constructor", "RandomViewDataset",
    "--dataset.scene", "lego_proxy",
    "--dataset.num-views", "20",
    "--dataset.height", "128", "--dataset.width", "128",
    "--dataset-transform.num-samples", "4096",
    "--grid.constructor", "HashGrid.from-geometric",
    "--grid.feature-std", "1e-9",
    "--grid.num-lods", "8",
    "--grid.codebook-bitwidth", "13",
    "--grid.min-grid-res", "16",
    "--grid.max-grid-res", "256",
    "--grid.multiscale-type", "cat",
    "--grid.dense-lod-matmul", "bf16",
    "--nef.prune-density-decay", "0.95",
    "--nef.prune-min-density", "2.956033378250884",
    "--tracer.raymarch-type", "ray",
    "--tracer.num-steps", "192",
    "--tracer.compaction", "0.5",
    "--tracer.early-stop", "0.01",
    "--tracer.march-stride", "2",
    "--trainer.adaptive-compaction", "true",
    # start_prune must wait for a trained density like the flagship's (iter 1000 ≈ epoch
    # 10 at 100 iters/epoch): combining start-prune 6 with the culling 0.95/2.956 params
    # pruned the UNTRAINED field to zero occupancy at iteration 6 and killed training
    # (valid fraction 0.0000, measured round 4). prune-every 3 then accelerates
    # prune-count ~8x vs the flagship to surface erosion within 40 epochs.
    "--trainer.prune-every", "3",
    "--trainer.start-prune", "200",
    "--trainer.max-epochs", "40",
    "--trainer.valid-every", "10",
    "--trainer.scheduler", "true",
    "--trainer.exp-name", "stoch-probe",
    "--tracker.log-dir", "/tmp/stoch_probe_logs",
    "--device", "cpu",
]

# Config grid (select via argv, e.g. `python _probe_stoch_erosion.py stoch_g1 stoch_g4`):
# stoch_g1 = round-4 erosion repro; stoch_g4/g8 = the round-5 grace-period fix
# (tests/core/test_prune_grace.py) under the same accelerated prune cadence; exact = the
# known-clean control.
CONFIGS = {
    # no-feedback controls (the pre-round-5 behavior; prune-sample-feedback defaults ON
    # since the round-5 erosion root-cause fix — see test_prune_sample_feedback.py)
    "stoch_g1": ["--grid.stoch-grad", "true",
                 "--trainer.prune-sample-feedback", "false"],
    "stoch_g4": ["--grid.stoch-grad", "true", "--nef.prune-grace", "4",
                 "--trainer.prune-sample-feedback", "false"],
    "stoch_g8": ["--grid.stoch-grad", "true", "--nef.prune-grace", "8",
                 "--trainer.prune-sample-feedback", "false"],
    "exact": ["--grid.stoch-grad", "false",
              "--trainer.prune-sample-feedback", "false"],
    # round-5 fix variants: sample-fed keep-score (default-on, stated explicitly)
    "stoch_fb": ["--grid.stoch-grad", "true",
                 "--trainer.prune-sample-feedback", "true"],
    "exact_fb": ["--grid.stoch-grad", "false",
                 "--trainer.prune-sample-feedback", "true"],
}

out = {}
names = sys.argv[1:] or ["stoch_g1", "exact"]
for name in names:
    r = main(BASE + CONFIGS[name] + ["--trainer.exp-name", f"stoch-probe-{name}"])
    out[name] = {str(k): float(v) for k, v in r.get("psnr_by_epoch", {}).items()
                 if v is not None}
    print(name, out[name], flush=True)
    with open("/tmp/stoch_probe.json", "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out))
