"""Rays — the core ray-batch datastructure.

TPU-native counterpart of the reference's ``Rays`` dataclass (wisp/core/rays.py:20-198):
origins / dirs tensors of shape [..., 3] plus near/far distances. Registered as a jax pytree so
ray batches flow through jit/vmap/shard_map; shape-manipulation helpers mirror the reference API
(cat, stack, split, reshape, squeeze, __getitem__, __len__). ``contiguous()``/``to()`` become
no-op / dtype-cast since jax arrays are always contiguous.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np


@jtu.register_dataclass
@dataclasses.dataclass
class Rays:
    origins: jax.Array      # [..., 3]
    dirs: jax.Array         # [..., 3]  (not necessarily normalized)
    dist_min: Union[float, jax.Array] = 0.0
    dist_max: Union[float, jax.Array] = 10.0

    # -- basic introspection ------------------------------------------------------------------
    @property
    def shape(self):
        return self.origins.shape[:-1]

    @property
    def ndim(self):
        return self.origins.ndim - 1

    @property
    def dtype(self):
        return self.origins.dtype

    def __len__(self):
        return int(np.prod(self.origins.shape[:-1]))

    # -- combinators (reference rays.py:63-120) ----------------------------------------------
    @classmethod
    def cat(cls, rays_list: Sequence["Rays"], axis: int = 0) -> "Rays":
        return cls(
            origins=jnp.concatenate([r.origins for r in rays_list], axis=axis),
            dirs=jnp.concatenate([r.dirs for r in rays_list], axis=axis),
            dist_min=rays_list[0].dist_min,
            dist_max=rays_list[0].dist_max,
        )

    @classmethod
    def stack(cls, rays_list: Sequence["Rays"], axis: int = 0) -> "Rays":
        return cls(
            origins=jnp.stack([r.origins for r in rays_list], axis=axis),
            dirs=jnp.stack([r.dirs for r in rays_list], axis=axis),
            dist_min=rays_list[0].dist_min,
            dist_max=rays_list[0].dist_max,
        )

    def __getitem__(self, idx) -> "Rays":
        return Rays(self.origins[idx], self.dirs[idx], self.dist_min, self.dist_max)

    def split(self, split_size: int) -> list:
        """Split along the leading dim into chunks of ``split_size`` (rays.py:122-136)."""
        n = self.origins.shape[0]
        return [self[i:i + split_size] for i in range(0, n, split_size)]

    def reshape(self, *dims) -> "Rays":
        if len(dims) == 1 and isinstance(dims[0], (tuple, list)):
            dims = tuple(dims[0])
        return Rays(
            self.origins.reshape(*dims),
            self.dirs.reshape(*dims),
            self.dist_min,
            self.dist_max,
        )

    def squeeze(self, axis: int = 0) -> "Rays":
        return Rays(
            jnp.squeeze(self.origins, axis=axis),
            jnp.squeeze(self.dirs, axis=axis),
            self.dist_min,
            self.dist_max,
        )

    def contiguous(self) -> "Rays":
        return self  # jax arrays are always contiguous

    def to(self, dtype) -> "Rays":
        return Rays(
            self.origins.astype(dtype),
            self.dirs.astype(dtype),
            self.dist_min,
            self.dist_max,
        )

    def normalized(self) -> "Rays":
        """Rays with unit-norm directions."""
        d = self.dirs / jnp.linalg.norm(self.dirs, axis=-1, keepdims=True)
        return Rays(self.origins, d, self.dist_min, self.dist_max)
