"""Image quality metrics: PSNR / SSIM / LPIPS.

Counterpart of reference wisp/ops/image/metrics.py:19-70 (which uses skimage + the lpips
package). PSNR and SSIM are implemented natively in jnp (SSIM follows Wang et al. 2004 with
the standard 11x11 Gaussian window, matching skimage's gaussian_weights=True sigma=1.5
configuration the reference requests). LPIPS requires pretrained perceptual nets; it is
gated — returns NaN with a one-time warning when torch/lpips weights are unavailable.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def psnr(rgb, gts, max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB (reference metrics.py:19-34)."""
    rgb = jnp.asarray(rgb, dtype=jnp.float32)
    gts = jnp.asarray(gts, dtype=jnp.float32)
    mse = jnp.mean((rgb - gts) ** 2)
    return float(10.0 * jnp.log10(max_val ** 2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def ssim(rgb, gts, max_val: float = 1.0) -> float:
    """Structural similarity (Wang et al. 2004), 11x11 Gaussian window sigma=1.5, averaged
    over channels (reference metrics.py:56-70 via skimage.metrics.structural_similarity)."""
    rgb = jnp.asarray(rgb, dtype=jnp.float32)
    gts = jnp.asarray(gts, dtype=jnp.float32)
    if rgb.ndim == 2:
        rgb = rgb[..., None]
        gts = gts[..., None]

    k = jnp.asarray(_gaussian_kernel())

    def _filter(img):  # separable gaussian blur over H, W for [H, W, C]
        pad = len(_gaussian_kernel()) // 2
        img = jnp.moveaxis(img, -1, 0)  # [C, H, W]
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, k, mode="same"), 0, ch))(img)
        img = jax.vmap(lambda ch: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, k, mode="same"), 1, ch))(img)
        del pad
        return jnp.moveaxis(img, 0, -1)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _filter(rgb)
    mu_y = _filter(gts)
    mu_x2, mu_y2, mu_xy = mu_x ** 2, mu_y ** 2, mu_x * mu_y
    sigma_x = _filter(rgb ** 2) - mu_x2
    sigma_y = _filter(gts ** 2) - mu_y2
    sigma_xy = _filter(rgb * gts) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / \
               ((mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2))
    # skimage crops the filter-invalid border (pad = win//2) before averaging
    pad = 5
    return float(jnp.mean(ssim_map[pad:-pad, pad:-pad]))


_lpips_model = None
_lpips_warned = False


def lpips(rgb, gts, net: str = "vgg") -> float:
    """Learned perceptual similarity (reference metrics.py:37-53). Needs the ``lpips``
    package + pretrained weights; unavailable in this environment → returns NaN once-warned."""
    global _lpips_model, _lpips_warned
    try:
        import torch
        import lpips as lpips_lib
        if _lpips_model is None:
            _lpips_model = lpips_lib.LPIPS(net=net)
        a = torch.from_numpy(np.asarray(rgb, dtype=np.float32)).permute(2, 0, 1)[None] * 2 - 1
        b = torch.from_numpy(np.asarray(gts, dtype=np.float32)).permute(2, 0, 1)[None] * 2 - 1
        with torch.no_grad():
            return float(_lpips_model(a, b).item())
    except ImportError:
        if not _lpips_warned:
            log.warning("lpips package unavailable; lpips() returns NaN")
            _lpips_warned = True
        return float("nan")
