"""End-to-end coverage of the nerf-synthetic (transforms.json) dataset format: a real
dataset directory is synthesized on disk from the analytic scene, loaded through
NeRFSyntheticDataset (including multiprocess decode), and trained on briefly."""

import json
import os

import numpy as np
import pytest


def _write_synthetic_dataset(root, num_views=6, res=64):
    """Render the analytic scene from fibonacci cameras and write lego-style files."""
    import jax.numpy as jnp
    from wisp_tpu.core.camera import Camera
    from wisp_tpu.datasets.random_view_dataset import render_gt
    from wisp_tpu.ops.geometric import sample_fib_sphere
    from wisp_tpu.ops.image.io import write_png
    from wisp_tpu.ops.raygen.raygen import generate_pinhole_rays

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    fov = np.radians(40.0)
    frames = []
    for i, eye in enumerate(sample_fib_sphere(num_views) * 3.2):
        up = (0.0, 1.0, 0.0) if abs(eye[1]) < 3.0 else (1.0, 0.0, 0.0)
        cam = Camera.from_args(eye=eye, at=(0.0, 0.0, 0.0), up=up, width=res, height=res,
                               fov=fov)
        rays = generate_pinhole_rays(cam)
        rgb, alpha = render_gt(rays, num_samples=256)
        img = np.concatenate([np.asarray(rgb), np.asarray(alpha)], -1).reshape(res, res, 4)
        write_png(os.path.join(root, "train", f"r_{i}.png"), img)
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": np.asarray(cam.cam_to_world).tolist()})
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            # aabb_scale pinned to 1.0: the fixture's analytic GT is rendered at these
            # exact poses, so the loader's lego-parity default (1.25) must not rescale them
            json.dump({"camera_angle_x": float(fov), "near": 0.0, "far": 6.0,
                       "aabb_scale": 1.0, "frames": frames}, fh)
    return root


class TestNeRFSyntheticFormat:
    def test_loader_roundtrips_cameras_and_pixels(self, tmp_path):
        from wisp_tpu.datasets.formats.nerf_standard import NeRFSyntheticDataset
        root = _write_synthetic_dataset(str(tmp_path), num_views=4, res=32)
        ds = NeRFSyntheticDataset(dataset_path=root, split="train", bg_color="white")
        assert ds.num_images == 4
        assert ds.img_shape == (32, 32)
        batch = ds[0]
        assert batch["rays"].origins.shape == (32 * 32, 3)
        assert batch["rgb"].shape == (32 * 32, 3)
        # camera origins sit on the radius-3.2 sphere
        o = np.asarray(batch["rays"].origins[0])
        assert np.linalg.norm(o) == pytest.approx(3.2, abs=0.01)

    def test_reference_pose_and_intrinsics_parity(self, tmp_path):
        """Reference transform semantics (nerf_standard_dataset.py:380-423): aabb_scale
        defaults to 1.25 and divides translations before scale/offset, cx/cy scale by
        2**mip, near/far default 1/5, and the blender Z-up world is rotated to Y-up."""
        from wisp_tpu.core.camera import blender_coords
        from wisp_tpu.datasets.formats.nerf_standard import NeRFSyntheticDataset
        root = _write_synthetic_dataset(str(tmp_path), num_views=2, res=32)
        with open(os.path.join(root, "transforms_train.json")) as fh:
            meta = json.load(fh)
        del meta["aabb_scale"], meta["near"], meta["far"]
        meta["cx"] = 20.0  # absolute pixels at mip 0
        meta["cy"] = 12.0
        meta["scale"] = 2.0
        meta["offset"] = [0.1, 0.0, 0.0]
        with open(os.path.join(root, "transforms_train.json"), "w") as fh:
            json.dump(meta, fh)
        ds = NeRFSyntheticDataset(dataset_path=root, split="train", mip=1)
        assert ds.img_shape == (16, 16)
        cam = ds.cameras["0"]
        assert cam.x0 == pytest.approx(20.0 / 2 - 16 // 2)
        assert cam.y0 == pytest.approx(12.0 / 2 - 16 // 2)
        assert cam.near == 1.0 and cam.far == 5.0
        t_raw = np.asarray(meta["frames"][0]["transform_matrix"], np.float32)[:3, 3]
        expected = t_raw / 1.25 * 2.0 + np.array([0.1, 0.0, 0.0], np.float32)
        # world was re-based to Y-up: camera position is expressed in the new basis
        expected = blender_coords().T @ expected
        np.testing.assert_allclose(cam.cam_pos, expected, atol=1e-5)

    def test_multiprocess_decode_matches_singleprocess(self, tmp_path):
        from wisp_tpu.datasets.formats.nerf_standard import NeRFSyntheticDataset
        root = _write_synthetic_dataset(str(tmp_path), num_views=3, res=32)
        a = NeRFSyntheticDataset(dataset_path=root, split="train")
        b = NeRFSyntheticDataset(dataset_path=root, split="train", dataset_num_workers=2)
        np.testing.assert_allclose(a.data["rgb"][0], b.data["rgb"][0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.data["rays"][1].dirs),
                                   np.asarray(b.data["rays"][1].dirs), atol=1e-6)

    def test_format_autodetect(self, tmp_path):
        from wisp_tpu.datasets.utils import load_multiview_dataset
        root = _write_synthetic_dataset(str(tmp_path), num_views=3, res=32)
        ds = load_multiview_dataset(root, split="train")
        assert type(ds).__name__ == "NeRFSyntheticDataset"

    def test_training_learns_from_disk_dataset(self, tmp_path):
        """Train briefly on the synthesized on-disk dataset through the full app path;
        loss must fall decisively (PSNR-grade training is covered by the procedural e2e)."""
        from app.nerf.main_nerf import main
        root = _write_synthetic_dataset(str(tmp_path / "ds"), num_views=6, res=64)
        import wisp_tpu.trainers.multiview_trainer as mt
        losses = []
        orig = mt.MultiviewTrainer.step

        def spy(self, data):
            orig(self, data)
            losses.append(self.tracker.metrics.average_metric("rgb_loss"))

        mt.MultiviewTrainer.step = spy
        try:
            main(argv=[
                "--trainer.max-epochs", "6",
                "--trainer.exp-name", "test-synth-format",
                "--trainer.valid-every", "-1", "--trainer.render-every", "-1",
                "--trainer.save-every", "-1", "--trainer.prune-every", "-1",
                "--trainer.target-sample-size", "16384",
                "--tracker.tensorboard", "false",
                "--tracker.log-dir", str(tmp_path / "logs"),
                "--dataset.constructor", "NeRFSyntheticDataset",
                "--dataset.dataset-path", root,
                "--dataset-transform.num-samples", "1024",
                "--trainer.optimizer.constructor", "AdamW",
                "--trainer.optimizer.lr", "0.001", "--trainer.optimizer.eps", "1e-15",
                "--trainer.grid-lr-weight", "300.0",
                "--trainer.rgb-loss-type", "huber",
                "--nef.view-embedder", "positional", "--nef.hidden-dim", "64",
                "--nef.bias", "true",
                "--grid.constructor", "HashGrid.from-geometric",
                "--grid.feature-std", "1e-9", "--grid.num-lods", "6",
                "--grid.codebook-bitwidth", "12", "--grid.min-grid-res", "16",
                "--grid.max-grid-res", "64", "--grid.multiscale-type", "cat",
                "--tracer.raymarch-type", "ray", "--tracer.num-steps", "64",
                "--blas-level", "4",
            ])
        finally:
            mt.MultiviewTrainer.step = orig
        assert losses[-1] < losses[2] * 0.5, f"loss did not fall: {losses[:3]}...{losses[-3:]}"
