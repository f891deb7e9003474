"""Single-image dataset for 2D neural field fitting
(reference wisp/datasets/image_dataset.py:37-69)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from wisp_tpu.datasets.base_datasets import WispDataset
from wisp_tpu.ops.geometric import normalized_grid


class ImageDataset(WispDataset):
    """Samples random (coord, pixel) batches from one RGB image. ``__len__`` is fixed at 100
    pseudo-entries per epoch like the reference."""

    def __init__(self, dataset_path: str, num_pixels_per_image: int = 4096, seed: int = 0):
        super().__init__(dataset_path=dataset_path)
        from wisp_tpu.ops.image.io import load_rgb
        self.image = load_rgb(os.path.abspath(os.path.expanduser(dataset_path)))
        if self.image.shape[-1] != 3:
            raise Exception("Alpha channel detected for image. "
                            "You should create a 3 channel RGB.")
        self.num_pixels_per_image = num_pixels_per_image
        self.h, self.w = self.image.shape[:2]
        self.coords = np.asarray(
            normalized_grid(self.h, self.w, use_aspect=False)).reshape(-1, 2)
        self.pixels = self.image.reshape(-1, 3)
        self._rng = np.random.default_rng(seed)

    def get_image(self) -> np.ndarray:
        return self.image

    def __len__(self):
        return 100

    def __getitem__(self, idx: int):
        rand_idx = self._rng.integers(0, self.coords.shape[0],
                                      size=(self.num_pixels_per_image,))
        return self.coords[rand_idx], self.pixels[rand_idx]

    def public_properties(self) -> dict:
        return {"Image": self.dataset_path, "Resolution": f"{self.w}x{self.h}",
                "Pixels per batch": self.num_pixels_per_image}
