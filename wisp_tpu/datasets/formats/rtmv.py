"""RTMVDataset — the RTMV EXR multiview format with depth.

Counterpart of reference wisp/datasets/formats/rtmv_dataset.py:31-579: per-frame
.exr (rgb+depth) + .json (camera) pairs, split by train/val ratios over the frame list,
sRGB handling, depth → pointcloud for acceleration-structure pre-pruning (``as_pointcloud``,
``supports_depth``). EXR decoding runs through the self-contained reader in
wisp_tpu.ops.image.exr (no pyexr/imageio EXR backend exists here); frames whose EXR can't be
decoded (e.g. compressed variants) are skipped with a warning (the reference gates pyexr the
same way, multiview_trainer.py:232-240).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Callable, List, Optional

import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.rays import Rays
from wisp_tpu.datasets.base_datasets import MultiviewDataset
from wisp_tpu.datasets.batch import MultiviewBatch

log = logging.getLogger(__name__)


class RTMVDataset(MultiviewDataset):
    def __init__(self, dataset_path: str, split: str = "train", mip: int = 0,
                 bg_color: str = "white", dataset_num_workers: int = -1,
                 transform: Optional[Callable] = None,
                 train_ratio: float = 2.0 / 3.0, val_ratio: float = 1.0 / 6.0):
        super().__init__(dataset_path=dataset_path, dataset_num_workers=dataset_num_workers,
                         transform=transform, split=split)
        self.mip = mip
        self.bg_color = bg_color
        self.train_ratio = train_ratio
        self.val_ratio = val_ratio
        self.data = self.load()

    @classmethod
    def is_root_of_dataset(cls, root: str, files_list: List[str]) -> bool:
        """RTMV roots hold numbered .exr + .json pairs (reference rtmv_dataset.py:150-170)."""
        has_exr = any(f.endswith(".exr") for f in files_list)
        has_json = any(f.endswith(".json") and not f.startswith("transforms")
                       for f in files_list)
        return has_exr and has_json

    def create_split(self, split: str, transform: Optional[Callable] = None) -> "RTMVDataset":
        """Same root, different frame-ratio split (reference rtmv_dataset.py:217-233)."""
        return RTMVDataset(dataset_path=self.dataset_path, split=split, mip=self.mip,
                           bg_color=self.bg_color,
                           dataset_num_workers=self.dataset_num_workers,
                           transform=transform, train_ratio=self.train_ratio,
                           val_ratio=self.val_ratio)

    def _split_frames(self, frames: List[str]) -> List[str]:
        """train/val/test split by ratio over the sorted frame list
        (reference rtmv_dataset.py:192-215)."""
        n = len(frames)
        n_train = int(n * self.train_ratio)
        n_val = int(n * self.val_ratio)
        if self.split == "train":
            return frames[:n_train]
        if self.split == "val":
            return frames[n_train:n_train + n_val]
        return frames[n_train + n_val:]

    def load_singleprocess(self):
        # Host-pinned: eager per-frame raygen/srgb ops over the TPU tunnel cost seconds
        # per op (datasets/utils.py host_device_ctx).
        from wisp_tpu.datasets.utils import host_device_ctx
        with host_device_ctx():
            return self._load_on_host()

    def _load_on_host(self):
        from wisp_tpu.ops.image.processing import linear_to_srgb, resize_mip
        from wisp_tpu.ops.raygen.raygen import generate_pinhole_rays

        root = os.path.abspath(os.path.expanduser(self.dataset_path))
        frames = sorted(glob.glob(os.path.join(root, "*.json")))
        frames = [f for f in frames if not os.path.basename(f).startswith("transforms")]
        frames = self._split_frames(frames)

        cameras, all_rays, rgbs, masks, depths = {}, [], [], [], []
        for i, meta_path in enumerate(frames):
            exr_path = os.path.splitext(meta_path)[0] + ".exr"
            if not os.path.exists(exr_path):
                continue
            try:
                from wisp_tpu.ops.image.exr import read_exr_rgbd
                rgb_lin, depth_img = read_exr_rgbd(exr_path)
                img = np.concatenate([rgb_lin, depth_img], -1) if depth_img is not None \
                    else rgb_lin
            except Exception as e:  # noqa: BLE001 - e.g. compressed EXRs
                log.warning(f"cannot decode {exr_path} ({e}); frame skipped")
                continue
            with open(meta_path) as fh:
                meta = json.load(fh)

            rgb = np.asarray(linear_to_srgb(img[..., :3])).astype(np.float32)
            depth = img[..., 3:4] if img.shape[-1] > 3 else None
            if self.mip > 0:
                rgb = resize_mip(rgb, self.mip)
                if depth is not None:
                    depth = resize_mip(depth, self.mip)[..., None]
            h, w = rgb.shape[:2]

            cam_data = meta.get("camera_data", meta)
            c2w = np.asarray(cam_data.get("cam2world",
                                          cam_data.get("camera_to_world")),
                             dtype=np.float32).reshape(4, 4)
            if "intrinsics" in cam_data:
                intr = cam_data["intrinsics"]
                focal_x = float(intr.get("fx", intr.get("focal", w))) / (2 ** self.mip)
                focal_y = float(intr.get("fy", focal_x * (2 ** self.mip))) / (2 ** self.mip)
            else:
                focal_x = focal_y = 0.5 * w / np.tan(
                    0.5 * np.radians(float(cam_data.get("fov", 45.0))))
            camera = Camera.from_cam_to_world(c2w.T if c2w[3, 3] == 1.0 and
                                              abs(c2w[3, 0]) + abs(c2w[3, 1]) +
                                              abs(c2w[3, 2]) > 1e-6 else c2w,
                                              width=w, height=h,
                                              focal_x=focal_x, focal_y=focal_y,
                                              near=0.0, far=6.0)
            # RTMV worlds are blender Z-up (reference rtmv_dataset.py:479)
            from wisp_tpu.core.camera import blender_coords
            camera = camera.change_coordinate_system(blender_coords())
            cameras[str(i)] = camera
            rays = generate_pinhole_rays(camera)
            all_rays.append(Rays(np.asarray(rays.origins), np.asarray(rays.dirs),
                                 0.0, 6.0))
            rgbs.append(rgb.reshape(-1, 3))
            if depth is not None:
                depths.append(depth.reshape(-1, 1).astype(np.float32))
                masks.append((depth.reshape(-1, 1) > 0).astype(np.float32))
            else:
                masks.append(np.ones((h * w, 1), np.float32))

        if not rgbs:
            raise RuntimeError(
                f"RTMV dataset at {root} yielded no decodable frames "
                f"(EXR plugin availability is environment-dependent)")
        self._img_shape = (h, w)
        self._cameras = cameras
        out = {"rays": all_rays, "rgb": rgbs, "masks": masks}
        if depths:
            out["depth"] = depths
        return out

    # -- depth-derived pointcloud for blas pre-pruning (reference :566-579) --------------------
    @property
    def supports_depth(self) -> bool:
        return "depth" in self.data

    def as_pointcloud(self) -> Optional[np.ndarray]:
        if not self.supports_depth:
            return None
        from wisp_tpu.ops.pointcloud import create_pointcloud_from_images
        pts, _ = create_pointcloud_from_images(
            self.data["rgb"], self.data["masks"], self.data["rays"], self.data["depth"])
        return pts

    def __len__(self):
        return len(self.data["rays"])

    def __getitem__(self, idx: int) -> MultiviewBatch:
        batch = MultiviewBatch(rays=self.data["rays"][idx], rgb=self.data["rgb"][idx],
                               masks=self.data["masks"][idx])
        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    @property
    def img_shape(self):
        return self._img_shape

    @property
    def num_images(self):
        return len(self.data["rays"])

    @property
    def cameras(self):
        return self._cameras
