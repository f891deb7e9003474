"""Self-contained EXR I/O + RTMV dataset tests (no external EXR backend exists here —
wisp_tpu ships its own uncompressed-EXR reader/writer)."""

import json
import os

import numpy as np
import pytest

from wisp_tpu.ops.image.exr import read_exr, read_exr_rgbd, write_exr


class TestEXR:
    def test_roundtrip_float32(self, tmp_path, rng):
        planes = {"R": rng.random((12, 17)).astype(np.float32),
                  "G": rng.random((12, 17)).astype(np.float32),
                  "B": rng.random((12, 17)).astype(np.float32),
                  "Z": (rng.random((12, 17)) * 10).astype(np.float32)}
        p = str(tmp_path / "t.exr")
        write_exr(p, planes)
        back = read_exr(p)
        for k in planes:
            np.testing.assert_allclose(back[k], planes[k], atol=0)

    def test_roundtrip_half(self, tmp_path, rng):
        planes = {"R": rng.random((8, 8)).astype(np.float32)}
        p = str(tmp_path / "h.exr")
        write_exr(p, planes, half=True)
        back = read_exr(p)
        np.testing.assert_allclose(back["R"], planes["R"], atol=1e-3)

    def test_rgbd_convenience(self, tmp_path, rng):
        rgb = rng.random((10, 10, 3)).astype(np.float32)
        depth = rng.random((10, 10)).astype(np.float32)
        p = str(tmp_path / "d.exr")
        write_exr(p, {"R": rgb[..., 0], "G": rgb[..., 1], "B": rgb[..., 2], "Z": depth})
        rgb2, d2 = read_exr_rgbd(p)
        np.testing.assert_allclose(rgb2, rgb, atol=0)
        np.testing.assert_allclose(d2[..., 0], depth, atol=0)

    def test_rejects_non_exr(self, tmp_path):
        p = str(tmp_path / "no.exr")
        with open(p, "wb") as fh:
            fh.write(b"not an exr at all")
        with pytest.raises(ValueError):
            read_exr(p)


class TestRTMVDataset:
    def _write_rtmv(self, root, num_frames=6, res=24):
        """Synthesize an RTMV-style dir: NNNN.exr (rgb+depth) + NNNN.json (camera)."""
        from wisp_tpu.core.camera import Camera
        from wisp_tpu.ops.geometric import sample_fib_sphere
        os.makedirs(root, exist_ok=True)
        rng = np.random.default_rng(0)
        for i, eye in enumerate(sample_fib_sphere(num_frames) * 3.0):
            cam = Camera.from_args(eye=eye, at=(0, 0, 0), width=res, height=res,
                                   fov=np.radians(40.0))
            rgb = rng.random((res, res, 3)).astype(np.float32)
            depth = np.full((res, res), 2.5, np.float32)
            write_exr(os.path.join(root, f"{i:05d}.exr"),
                      {"R": rgb[..., 0], "G": rgb[..., 1], "B": rgb[..., 2],
                       "Z": depth})
            with open(os.path.join(root, f"{i:05d}.json"), "w") as fh:
                json.dump({"camera_data": {
                    "cam2world": np.asarray(cam.cam_to_world).tolist(),
                    "intrinsics": {"fx": float(cam.focal_x), "fy": float(cam.focal_y)},
                }}, fh)
        return root

    def test_loads_and_splits(self, tmp_path):
        from wisp_tpu.datasets.formats.rtmv import RTMVDataset
        root = self._write_rtmv(str(tmp_path / "rtmv"), num_frames=6)
        ds = RTMVDataset(dataset_path=root, split="train")
        assert ds.num_images == 4  # 2/3 train ratio of 6
        assert ds.supports_depth

    def test_depth_pointcloud_for_pruning(self, tmp_path):
        from wisp_tpu.datasets.formats.rtmv import RTMVDataset
        root = self._write_rtmv(str(tmp_path / "rtmv2"), num_frames=6)
        ds = RTMVDataset(dataset_path=root, split="train")
        pc = ds.as_pointcloud()
        assert pc is not None and pc.shape[1] == 3
        # constant depth 2.5 from radius-3 cameras → points within the scene region
        assert np.linalg.norm(pc, axis=1).max() < 3.0

    def test_autodetect_rtmv(self, tmp_path):
        from wisp_tpu.datasets.utils import load_multiview_dataset
        root = self._write_rtmv(str(tmp_path / "rtmv3"), num_frames=3)
        ds = load_multiview_dataset(root, split="train")
        assert type(ds).__name__ == "RTMVDataset"
