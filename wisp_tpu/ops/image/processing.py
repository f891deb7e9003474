"""Image processing helpers (reference wisp/ops/image/processing.py:13-41)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_to_linear(img):
    """sRGB -> linear (reference processing.py:13-22)."""
    img = jnp.asarray(img)
    limit = 0.04045
    return jnp.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    """linear -> sRGB (reference processing.py:25-33)."""
    img = jnp.asarray(img)
    limit = 0.0031308
    return jnp.where(img > limit, 1.055 * (img ** (1.0 / 2.4)) - 0.055, 12.92 * img)


def resize_mip(img: np.ndarray, mip: int, interpolation=None) -> np.ndarray:
    """Downscale an image by 2^mip (reference processing.py:36-41 via cv2.resize)."""
    import cv2
    if interpolation is None:
        interpolation = cv2.INTER_AREA
    resize_factor = 2 ** mip
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    return cv2.resize(arr, (w // resize_factor, h // resize_factor),
                      interpolation=interpolation)
