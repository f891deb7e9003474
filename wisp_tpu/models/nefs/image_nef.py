"""ImageNeuralField — 2D neural field for image fitting.

Counterpart of reference wisp/models/nefs/image_nef.py:38-97: 2D hash grid features +
positional embedding → BasicDecoder → sigmoid rgb. The embedder uses 3 frequencies over 2D
coords (the reference builds it with default input_dim=3 then hardcodes embed_dim=14 — the 2D
value; we build with input_dim=2 which yields the same 14 dims).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from wisp_tpu.models.nefs.base_nef import BaseNeuralField
from wisp_tpu.models.decoders.basic_decoders import BasicDecoder
from wisp_tpu.models.embedders.positional_embedder import get_positional_embedder
from wisp_tpu.models.activations import get_activation_class
from wisp_tpu.models.layers import get_layer_class


class ImageNeuralField(BaseNeuralField):
    def __init__(self,
                 grid,
                 activation_type: str = "relu",
                 layer_type: str = "none",
                 hidden_dim: int = 128,
                 num_layers: int = 1,
                 *,
                 key=None):
        self.grid = grid
        self.activation_type = activation_type
        self.layer_type = layer_type
        self.hidden_dim = hidden_dim
        self.num_layers = num_layers

        if grid.multiscale_type == "cat":
            self.feature_dim = grid.feature_dim * len(grid.resolutions)
        else:
            self.feature_dim = grid.feature_dim

        self.embedder, self.embed_dim = get_positional_embedder(frequencies=3, input_dim=2,
                                                                include_input=True)
        self.input_dim = self.feature_dim + self.embed_dim

        if key is None:
            key = jax.random.PRNGKey(0)
        self.decoder = BasicDecoder(self.input_dim, 3,
                                    get_activation_class(activation_type), True,
                                    layer=get_layer_class(layer_type),
                                    num_layers=num_layers, hidden_dim=hidden_dim,
                                    skip=[], key=key)
        super().__init__()

    def register_forward_functions(self):
        self._register_forward_function(self.rgb, ["rgb"])

    def rgb(self, coords, lod=None):
        """[N, 2] coords in [-1,1] -> [N, 3] rgb (reference image_nef.py:73-97)."""
        if lod is None:
            lod = len(self.grid.resolutions) - 1
        batch = coords.shape[0]
        feats = self.grid.interpolate(coords, lod).reshape(batch, self.feature_dim)
        embedded_pos = self.embedder(coords).reshape(batch, self.embed_dim)
        fpos = jnp.concatenate([feats, embedded_pos], axis=-1)
        return jax.nn.sigmoid(self.decoder(fpos))

    def public_properties(self) -> Dict[str, Any]:
        return {"Grid": self.grid.name(), "Decoder": self.decoder.public_properties()}
