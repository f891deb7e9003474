"""End-to-end image-fitting test (counterpart of the reference's train-to-PSNR integration
tests, SURVEY.md §4). Runs the actual app main in-process (the reference scrapes subprocess
stdout; our mains return the metrics dict directly — reference base_trainer.py:170-172
already supports that pattern)."""

import sys


def test_image_app_overfit(tmp_path):
    sys.path.insert(0, "app/image")
    from app.image.main_image import main

    result = main(argv=[
        "--trainer.max-epochs", "4",
        "--trainer.exp-name", "test-image",
        "--trainer.valid-every", "-1",
        "--trainer.render-every", "-1",
        "--trainer.save-every", "-1",
        "--tracker.tensorboard", "false",
        "--tracker.log-dir", str(tmp_path),
        "--grid.num-lods", "8",
        "--grid.codebook-bitwidth", "14",
        "--dataset.num-pixels-per-image", "8192",
        "--trainer.optimizer.lr", "0.005",
        "--trainer.grid-lr-weight", "10.0",
    ])
    # 4 epochs of overfit on the procedural image must clear a modest PSNR bar.
    assert "psnr" in result
    assert result["psnr"] > 18.0, f"PSNR too low: {result}"
