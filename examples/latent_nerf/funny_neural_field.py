"""Extension-API demo: a custom neural field with an extra 'color_feature' latent channel.

Counterpart of the reference's latent_nerf example (examples/latent_nerf/
funny_neural_field.py), which teaches how to extend wisp with new fields + channels: this
field exposes the usual rgb/density plus a 3D latent projected to color — the tracer
volumetrically integrates the extra channel automatically (PackedRFTracer extra_channels
path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wisp_tpu.models.activations import get_activation_class
from wisp_tpu.models.decoders.basic_decoders import BasicDecoder
from wisp_tpu.models.layers import get_layer_class
from wisp_tpu.models.nefs.base_nef import BaseNeuralField


class FunnyNeuralField(BaseNeuralField):
    """NeRF-like field with an additional latent head ('color_feature' channel)."""

    def __init__(self, grid=None, hidden_dim: int = 64, *, key=None):
        self.grid = grid
        if key is None:
            key = jax.random.PRNGKey(0)
        kd, kc, kl = jax.random.split(key, 3)
        feat_dim = grid.feature_dim * grid.num_lods \
            if grid.multiscale_type == "cat" else grid.feature_dim
        self.decoder_density = BasicDecoder(feat_dim, 16, get_activation_class("relu"),
                                            True, layer=get_layer_class("linear"),
                                            num_layers=1, hidden_dim=hidden_dim, skip=[],
                                            key=kd)
        self.decoder_color = BasicDecoder(15, 3, get_activation_class("relu"), True,
                                          layer=get_layer_class("linear"), num_layers=2,
                                          hidden_dim=hidden_dim, skip=[], key=kc)
        self.decoder_latent = BasicDecoder(15, 3, get_activation_class("sin"), True,
                                           layer=get_layer_class("linear"), num_layers=1,
                                           hidden_dim=hidden_dim, skip=[], key=kl)
        super().__init__()

    def register_forward_functions(self):
        # one fn covers rgb+density, a second supplies the custom latent channel
        self._register_forward_function(self.rgba, ["rgb", "density"])
        self._register_forward_function(self.color_feature, ["color_feature"])

    def _features(self, coords):
        batch = coords.shape[0]
        return self.grid.interpolate(coords, self.grid.num_lods - 1).reshape(batch, -1)

    def rgba(self, coords, ray_d=None, lod_idx=None):
        density_feats = self.decoder_density(self._features(coords))
        rgb = jax.nn.sigmoid(self.decoder_color(density_feats[..., 1:]))
        density = jax.nn.relu(density_feats[..., 0:1])
        return {"rgb": rgb, "density": density}

    def color_feature(self, coords, ray_d=None, lod_idx=None):
        density_feats = self.decoder_density(self._features(coords))
        return jax.nn.sigmoid(self.decoder_latent(density_feats[..., 1:]))
