"""CodebookOctreeGrid — VQAD variable-bitrate feature grid.

Counterpart of reference wisp/models/grids/codebook_grid.py:21-~250 (Takikawa et al. 2022,
Variable Bitrate Neural Fields): octree dual vertices store *logits* over a small per-LOD
dictionary instead of raw features. Training uses a straight-through softmax→hard-one-hot
lookup (reference :117-125); eval uses argmax indexing (reference :130-134); ``bake()``
collapses logits to integer indices for compressed storage (reference :99-101).

TPU note: the [N, 8, dict_size] @ [dict_size, F] lookup is a clean MXU matmul — a better fit
here than on CUDA where the reference needed a custom differentiable-hash kernel path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from wisp_tpu.models.grids.octree_grid import OctreeGrid


class CodebookOctreeGrid(OctreeGrid):
    def __init__(self,
                 blas=None,
                 feature_dim: int = 16,
                 num_lods: int = 1,
                 interpolation_type: str = "linear",
                 multiscale_type: str = "cat",
                 feature_std: float = 0.0,
                 feature_bias: float = 0.0,
                 codebook_bitwidth: int = 8,
                 *,
                 key=None):
        self.bitwidth = codebook_bitwidth
        self.dictionary_size = 2 ** codebook_bitwidth
        self.training = True
        self.baked = False
        super().__init__(blas=blas, feature_dim=feature_dim, num_lods=num_lods,
                         interpolation_type=interpolation_type,
                         multiscale_type=multiscale_type, feature_std=feature_std,
                         feature_bias=feature_bias, key=key)

    def init_feature_structure(self, key):
        """Per-LOD dictionary [2^bw, F] + per-vertex logits [V_l, 2^bw]
        (reference codebook_grid.py:64-97)."""
        from wisp_tpu.ops.spc.core import make_dual
        import numpy as np
        points_per_level = [np.asarray(p) for p in self.blas.points]
        if self.interpolation_type == "linear":
            dual_points, trinkets = make_dual(points_per_level)
            self.trinkets = [jnp.asarray(trinkets[lod]) for lod in self.active_lods]
            counts = [dual_points[lod].shape[0] for lod in self.active_lods]
        else:
            self.trinkets = None
            counts = [points_per_level[lod].shape[0] for lod in self.active_lods]
        self.num_feat = sum(counts)

        keys = jax.random.split(key, 2 * len(counts))
        self.dictionary = [
            self.feature_std * jax.random.normal(keys[2 * i],
                                                 (self.dictionary_size, self.feature_dim))
            for i in range(len(counts))
        ]
        self.features = [
            self.feature_std * jax.random.normal(keys[2 * i + 1],
                                                 (n, self.dictionary_size))
            for i, n in enumerate(counts)
        ]

    def _index_features(self, feats, idx, lod_idx):
        """Straight-through dictionary lookup (reference codebook_grid.py:106-135).

        Training: softmax over logits, hard one-hot forward, soft gradient (straight-through
        estimator); eval / baked: plain argmax indexing.
        """
        dictionary = self.dictionary[lod_idx]
        if self.baked:
            keys_idx = feats[idx].astype(jnp.int32)
            return dictionary[keys_idx]
        if self.training:
            # rematerialized: softmax/one-hot intermediates are [N, 8, dict_size] each —
            # recomputing them in backward halves the dominant memory term
            def st_lookup(feats_, dictionary_):
                logits = feats_[idx]                        # [..., dict_size]
                y_soft = jax.nn.softmax(logits, axis=-1)
                index = jnp.argmax(y_soft, axis=-1)
                y_hard = jax.nn.one_hot(index, self.dictionary_size, dtype=logits.dtype)
                st_keys = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
                return st_keys @ dictionary_                 # MXU matmul
            return jax.checkpoint(st_lookup)(feats, dictionary)
        logits = feats[idx]                                 # [..., dict_size]
        keys_idx = jnp.argmax(logits, axis=-1)
        return dictionary[keys_idx]

    def bake(self) -> "CodebookOctreeGrid":
        """Collapse logits to indices (reference codebook_grid.py:99-101); returns a baked
        copy whose 'features' are float dictionary indices."""
        baked_features = [jnp.argmax(f, axis=-1).astype(jnp.float32) for f in self.features]
        new = self.replace(features=baked_features)
        new.__dict__["baked"] = True
        return new

    def eval(self) -> "CodebookOctreeGrid":
        new = self.replace(features=self.features)
        new.__dict__["training"] = False
        return new

    def name(self) -> str:
        return "Codebook Grid"

    def public_properties(self) -> Dict[str, Any]:
        props = super().public_properties()
        props["Codebook size"] = f"2^{self.bitwidth}"
        return props
