"""End-to-end NeRF train-to-PSNR tests (counterpart of reference tests/apps/test_nerf.py,
which trains on lego/V8 and asserts PSNR floors at given epochs). No lego data ships in this
environment, so the procedural RandomViewDataset scene stands in: its ground truth is exact
volumetric rendering of an analytic field, so a correct NeRF stack must fit it well."""

import sys

import pytest


def _run(extra, epochs=15):
    from app.nerf.main_nerf import main
    args = [
        "--trainer.max-epochs", str(epochs),
        "--trainer.exp-name", "test-nerf",
        "--trainer.valid-every", "-1",
        "--trainer.render-every", "-1",
        "--trainer.save-every", "-1",
        "--trainer.prune-every", "-1",
        "--tracker.tensorboard", "false",
        "--dataset.constructor", "RandomViewDataset",
        "--dataset.num-views", "12",
        "--dataset.height", "64", "--dataset.width", "64",
        "--dataset-transform.num-samples", "2048",
        # reference nerf_hash.yaml hyperparameters (AdamW 1e-3, huber, grid_lr_weight 500)
        "--trainer.optimizer.constructor", "AdamW",
        "--trainer.optimizer.lr", "0.001",
        "--trainer.optimizer.eps", "1e-15",
        "--trainer.optimizer.weight-decay", "1e-6",
        "--trainer.grid-lr-weight", "500.0",
        "--trainer.rgb-loss-type", "huber",
        "--nef.view-embedder", "positional",
        "--nef.hidden-dim", "64",
        "--nef.bias", "true",
        "--blas-level", "5",
    ] + extra
    return main(argv=args)


def test_nerf_hash_quick():
    """Hash-grid NeRF on the synthetic scene: PSNR must clear a floor
    (mirrors reference test_nerf.py:34-35 quick config assertions; thresholds adapted to the
    procedural scene — a correct stack reaches ~28 dB at 15 epochs, a broken one sits <13)."""
    result = _run([
        "--grid.constructor", "HashGrid.from-geometric",
        "--grid.feature-std", "1e-9",
        "--grid.num-lods", "8",
        "--grid.codebook-bitwidth", "12",
        "--grid.min-grid-res", "16",
        "--grid.max-grid-res", "128",
        "--grid.multiscale-type", "cat",
        "--tracer.raymarch-type", "ray",
        "--tracer.num-steps", "128",
    ], epochs=15)
    assert "psnr" in result
    assert result["psnr"] > 24.0, f"PSNR too low: {result}"
