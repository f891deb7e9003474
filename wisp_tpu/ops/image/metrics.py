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


# --------------------------------------------------------------------------------------
# LPIPS (reference metrics.py:37-53 uses the `lpips` torch package). Here the full
# VGG-16 LPIPS network (Zhang et al. 2018) is implemented natively in JAX; the pretrained
# weights (~58 MB fp32, ~29 MB fp16) load from an .npz pointed at by the
# WISP_LPIPS_WEIGHTS env var. tools/export_lpips_weights.py converts the torch `lpips`
# package checkpoint into that .npz on any machine that has torch+lpips installed.
#
# Weight schema (npz keys):
#   conv{i}_w [kh, kw, cin, cout] (HWIO), conv{i}_b [cout]   for i in 0..12  (VGG-16 convs)
#   lin{k}_w  [c_k]                                          for k in 0..4   (calibration)
# When no weights are available, lpips_available() is False and lpips() raises — callers
# (trainers) drop the metric with an explicit one-time log instead of emitting silent NaN.
# --------------------------------------------------------------------------------------

# VGG-16 conv plan: (out_channels, maxpool_before_this_conv)
_VGG_PLAN = [(64, False), (64, False), (128, True), (128, False), (256, True), (256, False),
             (256, False), (512, True), (512, False), (512, False), (512, True),
             (512, False), (512, False)]
# indices (into the 13 convs) after whose relu LPIPS taps features: relu1_2..relu5_3
_TAPS = (1, 3, 6, 9, 12)
# lpips input normalization (applied to images scaled to [-1, 1])
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

_lpips_weights = None
_lpips_tried = False
_lpips_fn = None
_lpips_jw = None  # device-staged weights (uploaded once)


def _load_lpips_weights():
    global _lpips_weights, _lpips_tried
    if _lpips_tried:
        return _lpips_weights
    _lpips_tried = True
    import os
    path = os.environ.get("WISP_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        raw = np.load(path)
        _lpips_weights = {k: np.asarray(raw[k], np.float32) for k in raw.files}
        log.info("loaded LPIPS weights from %s", path)
    return _lpips_weights


def lpips_available() -> bool:
    """True iff LPIPS weights were found (WISP_LPIPS_WEIGHTS). Callers should check this
    and *drop* the metric explicitly rather than report NaN."""
    return _load_lpips_weights() is not None


def reset_lpips_cache():
    """Re-probe WISP_LPIPS_WEIGHTS on next call (test hook)."""
    global _lpips_weights, _lpips_tried, _lpips_fn, _lpips_jw
    _lpips_weights, _lpips_tried, _lpips_fn, _lpips_jw = None, False, None, None


def _lpips_forward(weights, a, b):
    """a, b: [H, W, 3] in [0, 1] → scalar LPIPS distance."""
    import jax.lax as lax
    shift, scale = jnp.asarray(_SHIFT), jnp.asarray(_SCALE)

    def prep(img):
        img = img.astype(jnp.float32) * 2.0 - 1.0          # [-1, 1]
        img = (img - shift) / scale
        return img[None]                                    # [1, H, W, 3] NHWC

    def vgg_taps(x):
        taps = []
        for i, (_, pool) in enumerate(_VGG_PLAN):
            if pool:
                x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID")
            x = lax.conv_general_dilated(x, weights[f"conv{i}_w"], (1, 1), "SAME",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + weights[f"conv{i}_b"])
            if i in _TAPS:
                taps.append(x)
        return taps

    ta, tb = vgg_taps(prep(a)), vgg_taps(prep(b))
    total = 0.0
    for k, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / jnp.sqrt(jnp.sum(fa ** 2, axis=-1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb ** 2, axis=-1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2                                  # [1, h, w, c]
        lin = jnp.maximum(weights[f"lin{k}_w"], 0.0)         # lpips clamps lin weights >= 0
        total = total + jnp.mean(jnp.sum(d2 * lin, axis=-1)) # 1x1 conv + spatial average
    return total


def lpips(rgb, gts) -> float:
    """Learned perceptual image patch similarity, VGG variant (Zhang et al. 2018;
    reference metrics.py:37-53). Raises RuntimeError when no weights are configured —
    check :func:`lpips_available` first."""
    global _lpips_fn
    weights = _load_lpips_weights()
    if weights is None:
        raise RuntimeError(
            "LPIPS weights unavailable: set WISP_LPIPS_WEIGHTS to an .npz exported by "
            "tools/export_lpips_weights.py (or remove 'lpips' from valid_metrics)")
    if _lpips_fn is None:
        _lpips_fn = jax.jit(_lpips_forward)
    global _lpips_jw
    if _lpips_jw is None:
        # stage the ~58 MB weight dict onto the device ONCE — re-uploading per call cost
        # seconds per validation image on the tunneled-TPU platform
        _lpips_jw = {k: jnp.asarray(v) for k, v in weights.items()}
    return float(_lpips_fn(_lpips_jw, jnp.asarray(rgb, jnp.float32),
                           jnp.asarray(gts, jnp.float32)))
