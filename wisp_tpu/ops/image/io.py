"""Image I/O (reference wisp/ops/image/io.py:18-97): PNG/JPG via PIL, EXR via imageio
(replacing pyexr), layout helpers."""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

log = logging.getLogger(__name__)


def write_png(path: str, img) -> None:
    """Write an image tensor/array (HWC uint8 or float in [0,1]) as PNG (reference io.py:44-52)."""
    from PIL import Image
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def write_exr(path: str, data: Dict[str, np.ndarray]) -> None:
    """Write a multi-channel EXR (reference io.py:18-42 via pyexr; here the self-contained
    writer in wisp_tpu.ops.image.exr — no EXR backend exists in this environment).
    Multi-channel entries split into suffixed planes (rgb → R/G/B)."""
    from wisp_tpu.ops.image.exr import write_exr as _write
    planes: Dict[str, np.ndarray] = {}
    for key, value in data.items():
        arr = np.asarray(value, dtype=np.float32)
        if arr.ndim == 3 and arr.shape[-1] in (3, 4):
            names = ("R", "G", "B", "A")
            prefix = "" if key == "rgb" else key + "."
            for c in range(arr.shape[-1]):
                planes[prefix + names[c]] = arr[..., c]
        elif arr.ndim == 3 and arr.shape[-1] == 1:
            planes["Z" if key == "depth" else key] = arr[..., 0]
        else:
            planes[key] = arr
    _write(path, planes)


def load_rgb(path: str, normalize: bool = True) -> np.ndarray:
    """Load an image as float32 HWC RGB in [0,1] (reference io.py:55-77)."""
    from PIL import Image
    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    arr = arr.astype(np.float32)
    if normalize and arr.max() > 1.0:
        arr = arr / 255.0
    return arr


def hwc_to_chw(img: np.ndarray) -> np.ndarray:
    """[H, W, C] -> [C, H, W] (reference io.py:90-97)."""
    return np.moveaxis(img, -1, 0)


def chw_to_hwc(img: np.ndarray) -> np.ndarray:
    return np.moveaxis(img, 0, -1)
