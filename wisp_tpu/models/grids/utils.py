"""MultiTable — stacked multiresolution feature tables.

Counterpart of reference wisp/models/grids/utils.py:13-71: one flat learnable parameter
[total_feats, feature_dim] holding every LOD's table back-to-back, with per-LOD begin indices
and sizes. Per-LOD size = min(resolution^coord_dim, max_feats). Keeping one flat table (rather
than a param per LOD) gives the optimizer a single large array — friendlier to XLA fusion and
to sharding the table across a device mesh if it ever outgrows HBM (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from wisp_tpu.core.module import Module


class MultiTable(Module):
    def __init__(self,
                 resolutions: Sequence[int],
                 coord_dim: int,
                 feature_dim: int,
                 std: float = 0.01,
                 max_feats: Optional[int] = None,
                 mean: float = 0.0,
                 *,
                 key):
        self.num_lods = len(resolutions)
        self.coord_dim = coord_dim
        self.feature_dim = feature_dim
        self.max_feats = max_feats
        self.resolutions = tuple(int(r) for r in resolutions)

        num_feats, begin_idxes = [], [0]
        total = 0
        for res in self.resolutions:
            n = res ** coord_dim
            if max_feats:
                n = min(max_feats, n)
            num_feats.append(n)
            total += n
            begin_idxes.append(total)
        self.num_feats: Tuple[int, ...] = tuple(num_feats)
        self.begin_idxes: Tuple[int, ...] = tuple(begin_idxes)
        self.total_feats = total

        self.feats = mean + std * jax.random.normal(key, (total, feature_dim), jnp.float32)

    def get_level(self, idx: int) -> jax.Array:
        """Features for one LOD (reference utils.py:66-71)."""
        return self.feats[self.begin_idxes[idx]:self.begin_idxes[idx + 1]]

    def __len__(self):
        return self.num_lods
