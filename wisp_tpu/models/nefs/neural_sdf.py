"""NeuralSDF — neural signed distance field (NGLOD).

Counterpart of reference wisp/models/nefs/neural_sdf.py:20-180: grid features (+ optional
positional embedding) → single-output BasicDecoder per queried LOD.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from wisp_tpu.models.activations import get_activation_class
from wisp_tpu.models.decoders.basic_decoders import BasicDecoder
from wisp_tpu.models.embedders.positional_embedder import get_positional_embedder
from wisp_tpu.models.layers import get_layer_class
from wisp_tpu.models.nefs.base_nef import BaseNeuralField


class NeuralSDF(BaseNeuralField):
    def __init__(self,
                 grid=None,
                 pos_embedder: str = "none",     # 'none' | 'identity' | 'positional'
                 pos_multires: int = 4,
                 position_input: bool = False,
                 activation_type: str = "relu",
                 layer_type: str = "linear",
                 hidden_dim: int = 128,
                 num_layers: int = 1,
                 *,
                 key=None):
        self.grid = grid
        self.pos_embedder_type = pos_embedder
        self.pos_embedder, self.pos_embed_dim = self.init_embedder(
            pos_embedder, pos_multires, position_input)
        self.activation_type = activation_type
        self.layer_type = layer_type
        self.hidden_dim = hidden_dim
        self.num_layers = num_layers

        if key is None:
            key = jax.random.PRNGKey(0)
        self.decoder = BasicDecoder(
            input_dim=self.effective_feature_dim() + self.pos_embed_dim,
            output_dim=1, activation=get_activation_class(activation_type), bias=True,
            layer=get_layer_class(layer_type.replace("_norm", "")),
            num_layers=num_layers, hidden_dim=hidden_dim, skip=[], key=key)
        super().__init__()

    def init_embedder(self, embedder_type, frequencies, include_input):
        if embedder_type == "none" and not include_input:
            return None, 0
        if embedder_type == "identity" or (embedder_type == "none" and include_input):
            return (lambda x: x), 3
        if embedder_type == "positional":
            return get_positional_embedder(frequencies=frequencies,
                                           include_input=include_input)
        raise NotImplementedError(embedder_type)

    def effective_feature_dim(self) -> int:
        if self.grid.multiscale_type == "cat":
            return self.grid.feature_dim * self.grid.num_lods
        return self.grid.feature_dim

    def register_forward_functions(self):
        self._register_forward_function(self.sdf, ["sdf"])

    def sdf(self, coords, lod_idx=None):
        """[N,3] -> signed distance [N,1] (reference neural_sdf.py:130-180)."""
        if lod_idx is None:
            lod_idx = self.grid.num_lods - 1
        batch = coords.shape[0]
        feats = self.grid.interpolate(coords, lod_idx).reshape(batch, -1)
        if self.pos_embedder is not None:
            feats = jnp.concatenate(
                [feats, self.pos_embedder(coords).reshape(batch, self.pos_embed_dim)],
                axis=-1)
        return self.decoder(feats)

    def sdf_all_lods(self, coords):
        """Per-LOD SDF predictions [num_lods, N, 1] — the SDFTrainer's multi-LOD loss
        (reference sdf_trainer.py trains each LOD)."""
        return jnp.stack([self.sdf(coords, lod_idx=i)
                          for i in range(self.grid.num_lods)], axis=0)

    def public_properties(self) -> Dict[str, Any]:
        return {
            "Grid": self.grid.name() if self.grid is not None else None,
            "Pos. Embedding": self.pos_embedder_type,
            "Decoder": self.decoder.public_properties(),
        }


class NeuralSDFTex(NeuralSDF):
    """SDF + rgb texture variant (reference wisp/models/nefs/neural_sdf_tex.py:20-123):
    decoder outputs 4 channels (sdf + rgb)."""

    def __init__(self, grid=None, pos_embedder: str = "none", pos_multires: int = 4,
                 position_input: bool = False, activation_type: str = "relu",
                 layer_type: str = "linear", hidden_dim: int = 128, num_layers: int = 1,
                 *, key=None):
        super().__init__(grid=grid, pos_embedder=pos_embedder, pos_multires=pos_multires,
                         position_input=position_input, activation_type=activation_type,
                         layer_type=layer_type, hidden_dim=hidden_dim,
                         num_layers=num_layers, key=key)
        if key is None:
            key = jax.random.PRNGKey(0)
        self.decoder = BasicDecoder(
            input_dim=self.effective_feature_dim() + self.pos_embed_dim,
            output_dim=4, activation=get_activation_class(activation_type), bias=True,
            layer=get_layer_class(layer_type.replace("_norm", "")),
            num_layers=num_layers, hidden_dim=hidden_dim, skip=[], key=key)

    def register_forward_functions(self):
        self._register_forward_function(self.rgbsdf, ["rgb", "sdf"])

    def rgbsdf(self, coords, lod_idx=None):
        """{'rgb': [N,3], 'sdf': [N,1]} (reference neural_sdf_tex.py:90-123)."""
        if lod_idx is None:
            lod_idx = self.grid.num_lods - 1
        batch = coords.shape[0]
        feats = self.grid.interpolate(coords, lod_idx).reshape(batch, -1)
        if self.pos_embedder is not None:
            feats = jnp.concatenate(
                [feats, self.pos_embedder(coords).reshape(batch, self.pos_embed_dim)],
                axis=-1)
        out = self.decoder(feats)
        return {"rgb": jax.nn.sigmoid(out[..., 1:4]), "sdf": out[..., 0:1]}
