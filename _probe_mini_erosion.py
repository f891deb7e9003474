"""Calibrate tests/apps/test_nerf.py::test_nerf_prune_erosion_trajectory_with_sample_feedback.

Runs the test's exact mini config (accelerated prune cadence, fast path active) with the
sample-fed keep-score ON and OFF, 20 epochs each, CPU. Writes /tmp/mini_erosion.json.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests/apps")

from test_nerf import _run  # noqa: E402

BASE = [
    "--grid.constructor", "HashGrid.from-geometric",
    "--grid.feature-std", "1e-9",
    "--grid.num-lods", "8",
    "--grid.codebook-bitwidth", "12",
    "--grid.min-grid-res", "16",
    "--grid.max-grid-res", "128",
    "--grid.multiscale-type", "cat",
    "--grid.dense-lod-matmul", "bf16",
    "--tracer.raymarch-type", "ray",
    "--tracer.num-steps", "128",
    "--tracer.compaction", "0.5",
    "--tracer.early-stop", "0.01",
    "--tracer.march-stride", "2",
    "--trainer.adaptive-compaction", "true",
    "--nef.prune-density-decay", "0.95",
    "--nef.prune-min-density", "2.956033378250884",
    "--trainer.prune-every", "2",
    "--trainer.start-prune", "36",
    "--trainer.valid-every", "10",
    "--device", "cpu",
]

out = {}
for name, flag in (("fb", "true"), ("nofb", "false")):
    r = _run(BASE + ["--trainer.prune-sample-feedback", flag,
                     "--trainer.exp-name", f"mini-erosion-{name}"], epochs=20)
    out[name] = {str(k): (round(float(v), 2) if v is not None else None)
                 for k, v in r.get("psnr_by_epoch", {}).items()}
    print(name, out[name], flush=True)
    with open("/tmp/mini_erosion.json", "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out))
