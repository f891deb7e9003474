"""TriplanarGrid — multiresolution pyramid of triplanes.

Counterpart of reference wisp/models/grids/triplanar_grid.py:19-250: each LOD is three learned
orthogonal feature planes ((yz), (xz), (xy)), bilinearly sampled with align_corners semantics
and reflection padding (torch F.grid_sample equivalents in pure jnp), features of the three
planes stacked (effective feature_dim ×3), LODs aggregated by cat/sum. Supports only an AABB
acceleration structure (reference :160-162).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from wisp_tpu.core.module import Module
from wisp_tpu.models.grids.blas_grid import BLASGrid


def _reflect(x, lo: float, hi: float):
    """Reflection padding for out-of-range coords (grid_sample padding_mode='reflection',
    align_corners=True: reflect across the border values)."""
    span = hi - lo
    x = jnp.abs(jnp.mod(x - lo, 2 * span) - span) + lo  # triangular fold into [lo, hi]
    return x


def bilinear_sample(plane, u, v):
    """Sample plane [H, W, F] at continuous coords u (width), v (height) in [-1, 1] with
    align_corners=True + reflection padding (matches torch grid_sample used by the
    reference TriplanarFeatureVolume)."""
    h, w = plane.shape[:2]
    u = _reflect(u, -1.0, 1.0)
    v = _reflect(v, -1.0, 1.0)
    x = (u + 1.0) * 0.5 * (w - 1)
    y = (v + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # row gathers on the flattened plane via gather_rows: its custom backward scatters
    # per feature column (~5x faster than the windowed row scatter JAX's gather
    # transpose emits on TPU — see ops/grid.py)
    from wisp_tpu.ops.grid import gather_rows
    flat = plane.reshape(h * w, plane.shape[-1])
    p00 = gather_rows(flat, (y0 * w + x0).reshape(-1)).reshape(*x0.shape, -1)
    p01 = gather_rows(flat, (y0 * w + x1).reshape(-1)).reshape(*x0.shape, -1)
    p10 = gather_rows(flat, (y1 * w + x0).reshape(-1)).reshape(*x0.shape, -1)
    p11 = gather_rows(flat, (y1 * w + x1).reshape(-1)).reshape(*x0.shape, -1)
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


class TriplanarFeatureVolume(Module):
    """One LOD's triplane (reference triplanar_grid.py:185-250): three (res+1)² feature maps
    sampled at the (y,z), (x,z), (x,y) slices of a 3D coordinate."""

    def __init__(self, fdim: int, fsize: int, std: float, bias: float, *, key):
        self.fsize = fsize
        self.fdim = fdim
        kx, ky, kz = jax.random.split(key, 3)
        shape = (fsize + 1, fsize + 1, fdim)
        self.fmx = bias + std * jax.random.normal(kx, shape, jnp.float32)
        self.fmy = bias + std * jax.random.normal(ky, shape, jnp.float32)
        self.fmz = bias + std * jax.random.normal(kz, shape, jnp.float32)

    def __call__(self, coords):
        """[N, 3] -> [N, 3*fdim]: per-axis plane samples stacked
        (reference grid indexing: fmx at (y,z), fmy at (x,z), fmz at (x,y), where the first
        picked coord maps to the sample grid's width axis)."""
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        sx = bilinear_sample(self.fmx, y, z)   # width <- y, height <- z
        sy = bilinear_sample(self.fmy, x, z)
        sz = bilinear_sample(self.fmz, x, y)
        return jnp.concatenate([sx, sy, sz], axis=-1)

    def public_properties(self) -> Dict[str, Any]:
        return {"Resolution": f"3x{self.fsize}x{self.fsize}"}


class TriplanarGrid(BLASGrid):
    def __init__(self,
                 blas=None,
                 feature_dim: int = 4,
                 log_base_resolution: int = 4,
                 num_lods: int = 1,
                 interpolation_type: str = "linear",
                 multiscale_type: str = "sum",
                 feature_std: float = 0.0,
                 feature_bias: float = 0.0,
                 *,
                 key=None):
        if blas is None:
            from wisp_tpu.accelstructs import AxisAlignedBBoxAS
            blas = AxisAlignedBBoxAS()
        self.blas = blas
        self.feature_dim = feature_dim * 3  # three planes (reference :65)
        self.num_lods = num_lods
        self.log_base_resolution = log_base_resolution
        self.interpolation_type = interpolation_type
        self.multiscale_type = multiscale_type
        self.feature_std = feature_std
        self.feature_bias = feature_bias
        self.active_lods = tuple(log_base_resolution + x for x in range(num_lods))
        self.frozen = False
        self.occupancy = None

        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, num_lods)
        self.features = [
            TriplanarFeatureVolume(feature_dim, 2 ** lod, feature_std, feature_bias, key=k)
            for lod, k in zip(self.active_lods, keys)
        ]
        self.num_feat = sum(((2 ** lod + 1) ** 2) * self.feature_dim
                            for lod in self.active_lods)

    def freeze(self) -> "TriplanarGrid":
        """Stop feature gradients (reference triplanar_grid.py freeze)."""
        return self.replace(frozen=True)

    def interpolate(self, coords, lod_idx):
        """Multiscale triplane query (reference triplanar_grid.py:100-122)."""
        output_shape = coords.shape[:-1]
        flat = coords.reshape(-1, 3)
        feats = [self.features[i](flat) for i in range(lod_idx + 1)]
        if self.frozen:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        feats = jnp.concatenate(feats, axis=-1)
        if self.multiscale_type == "sum":
            feats = feats.reshape(-1, lod_idx + 1, self.feature_dim).sum(-2)
            return feats.reshape(*output_shape, self.feature_dim)
        # 'cat': fixed output width num_lods*feature_dim, zero above lod_idx (align with
        # HashGrid's cat semantics so decoder input dims stay static)
        pad = (self.num_lods - (lod_idx + 1)) * self.feature_dim
        if pad > 0:
            feats = jnp.concatenate(
                [feats, jnp.zeros((*feats.shape[:-1], pad), feats.dtype)], axis=-1)
        return feats.reshape(*output_shape, self.feature_dim * self.num_lods)

    def raymarch(self, rays, raymarch_type, num_samples, level=None, key=None,
                 **kwargs):
        return self.blas.raymarch(rays, raymarch_type=raymarch_type,
                                  num_samples=num_samples, level=self.blas.max_level,
                                  key=key, **kwargs)

    @classmethod
    def supported_blas(cls):
        from wisp_tpu.accelstructs import AxisAlignedBBoxAS
        return [AxisAlignedBBoxAS]

    def name(self) -> str:
        return "Triplanar Grid"

    def public_properties(self) -> Dict[str, Any]:
        props = super().public_properties()
        props.update({
            "Feature Dims": self.feature_dim,
            "Active feature LODs": [str(x) for x in self.active_lods],
            "Interpolation": self.interpolation_type,
            "Multiscale aggregation": self.multiscale_type,
        })
        return props
