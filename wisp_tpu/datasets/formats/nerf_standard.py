"""NeRFSyntheticDataset — the nerf-synthetic / instant-ngp "standard" format loader.

Counterpart of reference wisp/datasets/formats/nerf_standard_dataset.py:30-465:
transforms_{split}.json parsing, per-frame image+pose loading with optional multiprocess pool
and mip rescaling, intrinsics from camera_angle_x / x_fov / fl_x, principal-point offsets,
offset/scale/aabb_scale pose transforms, alpha→mask with background compositing, per-view ray
pregeneration, tensors flattened to (V, H*W, C).

Host-side numpy throughout (rays transfer to device at the jit boundary in the trainer).
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.core.rays import Rays
from wisp_tpu.datasets.base_datasets import MultiviewDataset
from wisp_tpu.datasets.batch import MultiviewBatch

log = logging.getLogger(__name__)


class NeRFSyntheticDataset(MultiviewDataset):
    def __init__(self, dataset_path: str, split: str = "train", mip: int = 0,
                 bg_color: str = "white", dataset_num_workers: int = -1,
                 transform: Optional[Callable] = None):
        super().__init__(dataset_path=dataset_path, dataset_num_workers=dataset_num_workers,
                         transform=transform, split=split)
        self.mip = mip
        self.bg_color = bg_color
        self.coords = None
        self.data = self.load()

    # -- format sniffing (reference nerf_standard_dataset.py:137-165) -------------------------
    @classmethod
    def is_root_of_dataset(cls, root: str, files_list: List[str]) -> bool:
        return any(f.startswith("transforms") and f.endswith(".json") for f in files_list)

    def create_split(self, split: str, transform=None) -> "NeRFSyntheticDataset":
        return NeRFSyntheticDataset(dataset_path=self.dataset_path, split=split,
                                    mip=self.mip, bg_color=self.bg_color,
                                    dataset_num_workers=self.dataset_num_workers,
                                    transform=transform)

    # -- loading (reference nerf_standard_dataset.py:167-450) ---------------------------------
    def _transforms_path(self) -> str:
        root = os.path.abspath(os.path.expanduser(self.dataset_path))
        candidates = [os.path.join(root, f"transforms_{self.split}.json"),
                      os.path.join(root, "transforms.json")]
        for c in candidates:
            if os.path.exists(c):
                return c
        raise FileNotFoundError(f"No transforms json for split {self.split!r} under {root}")

    def load_singleprocess(self) -> Dict:
        root = os.path.abspath(os.path.expanduser(self.dataset_path))
        with open(self._transforms_path()) as fh:
            metadata = json.load(fh)

        decoded, poses = [], []
        for frame in metadata["frames"]:
            fpath = os.path.join(root, frame["file_path"])
            if not os.path.splitext(fpath)[1]:
                for ext in (".png", ".jpg", ".exr"):
                    if os.path.exists(fpath + ext):
                        fpath = fpath + ext
                        break
            if not os.path.exists(fpath):
                log.warning(f"missing frame file {fpath}, skipped")
                continue
            decoded.append(self._load_frame_entry(
                (fpath, self.mip, self.bg_color == "white")))
            poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
        return self._assemble(decoded, poses, metadata)

    @staticmethod
    def _load_frame_entry(args):
        """Worker: decode one frame (reference _load_single_entry, :245-269)."""
        fpath, mip, bg_white = args
        import numpy as np
        from PIL import Image
        arr = np.asarray(Image.open(fpath)).astype(np.float32) / 255.0
        if mip > 0:
            from wisp_tpu.ops.image.processing import resize_mip
            arr = resize_mip(arr, mip)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 4:
            alpha = arr[..., 3:4]
            rgb = arr[..., :3] * alpha + (1.0 if bg_white else 0.0) * (1.0 - alpha)
        else:
            rgb, alpha = arr, np.ones_like(arr[..., :1])
        return rgb.astype(np.float32), alpha.astype(np.float32)

    def load_multiprocess(self) -> Dict:
        """Pool-decoded image loading (reference :271-320 uses torch.multiprocessing.Pool;
        here a stdlib Pool — the only inter-process mechanism the reference has at all,
        SURVEY.md §2.4)."""
        import multiprocessing as mp
        root = os.path.abspath(os.path.expanduser(self.dataset_path))
        with open(self._transforms_path()) as fh:
            metadata = json.load(fh)
        jobs, poses = [], []
        for frame in metadata["frames"]:
            fpath = os.path.join(root, frame["file_path"])
            if not os.path.splitext(fpath)[1]:
                for ext in (".png", ".jpg", ".exr"):
                    if os.path.exists(fpath + ext):
                        fpath = fpath + ext
                        break
            if os.path.exists(fpath):
                jobs.append((fpath, self.mip, self.bg_color == "white"))
                poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
        with mp.Pool(min(self.dataset_num_workers, mp.cpu_count())) as pool:
            decoded = pool.map(self._load_frame_entry, jobs)
        return self._assemble(decoded, poses, metadata)

    def _assemble(self, decoded, poses, metadata) -> Dict:
        """Camera/ray assembly shared by both load paths (reference :340-450).
        Pinned to the host CPU backend — per-view eager raygen over the TPU tunnel costs
        seconds per op (datasets/utils.py host_device_ctx)."""
        from wisp_tpu.datasets.utils import host_device_ctx
        with host_device_ctx():
            return self._assemble_on_host(decoded, poses, metadata)

    def _assemble_on_host(self, decoded, poses, metadata) -> Dict:
        from wisp_tpu.core.camera import blender_coords
        from wisp_tpu.ops.raygen.raygen import generate_pinhole_rays
        imgs = [d[0] for d in decoded]
        alphas = [d[1] for d in decoded]
        if not imgs:
            raise RuntimeError("dataset contains no readable frames")
        h, w = imgs[0].shape[:2]
        # intrinsics (reference :340-390): fl_x > x_fov > camera_angle_x. w/h are already
        # mip-downscaled, so focal/principal-point values from metadata scale by 2**mip.
        if "fl_x" in metadata:
            focal_x = metadata["fl_x"] / (2 ** self.mip)
            focal_y = metadata.get("fl_y", metadata["fl_x"]) / (2 ** self.mip)
        elif "x_fov" in metadata:
            focal_x = 0.5 * w / np.tan(0.5 * np.radians(metadata["x_fov"]))
            focal_y = focal_x
        else:
            focal_x = 0.5 * w / np.tan(0.5 * float(metadata["camera_angle_x"]))
            focal_y = focal_x
        x0 = float(metadata["cx"]) / (2 ** self.mip) - w // 2 if "cx" in metadata else 0.0
        y0 = float(metadata["cy"]) / (2 ** self.mip) - h // 2 if "cy" in metadata else 0.0
        # pose transforms (reference :392-399): t/aabb_scale*scale + offset, aabb 1.25
        offset = np.asarray(metadata.get("offset", [0.0, 0.0, 0.0]), dtype=np.float32)
        scale = float(metadata.get("scale", 1.0))
        aabb_scale = float(metadata.get("aabb_scale", 1.25))
        near = float(metadata.get("near", 1.0))
        far = float(metadata.get("far", 5.0))
        cameras, all_rays, rgbs, masks = {}, [], [], []
        for i, (rgb, alpha, pose) in enumerate(zip(imgs, alphas, poses)):
            c2w = pose.copy()
            c2w[:3, 3] = c2w[:3, 3] / aabb_scale * scale + offset
            camera = Camera.from_cam_to_world(c2w, width=w, height=h, focal_x=focal_x,
                                              focal_y=focal_y, x0=x0, y0=y0,
                                              near=near, far=far)
            # blender Z-up world -> render Y-up convention (reference :423)
            camera = camera.change_coordinate_system(blender_coords())
            cameras[str(i)] = camera
            rays = generate_pinhole_rays(camera)
            all_rays.append(Rays(origins=np.asarray(rays.origins),
                                 dirs=np.asarray(rays.dirs),
                                 dist_min=near, dist_max=far))
            rgbs.append(rgb.reshape(-1, 3))
            masks.append((alpha > 0.5).reshape(-1, 1))
        self._img_shape = (h, w)
        self._cameras = cameras
        return {"rays": all_rays, "rgb": rgbs, "masks": masks}

    # -- dataset protocol ----------------------------------------------------------------------
    def __len__(self) -> int:
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
    def num_images(self) -> int:
        return len(self.data["rays"])

    @property
    def cameras(self):
        return self._cameras

    def public_properties(self) -> dict:
        return {"Dataset": self.dataset_path, "Split": self.split,
                "Images": self.num_images, "Resolution": f"{self._img_shape}",
                "Background": self.bg_color, "Mip": self.mip}
