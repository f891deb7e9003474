"""NeuralRadianceField — density + view-dependent color field.

Counterpart of reference wisp/models/nefs/nerf.py:22-295. Architecture replicated exactly for
PSNR parity (SURVEY.md §7 'hard parts' #6):

* grid features (+ optional positional embedding) → density decoder (out 16, lout bias[0]
  init 1.0 when bias enabled — reference nerf.py:162-163)
* density = relu(channel 0); color = sigmoid(color_decoder(channels 1:16 ⊕ view embedding))
  (reference nerf.py:219-264)
* instant-ngp pruning scheme (reference nerf.py:175-212): decay per-cell occupancy, re-query
  density at one jittered sample per cell, keep max, threshold. TPU twist: instead of
  rebuilding the octree from surviving points (shape change → recompile), the max_level
  occupancy *bitfield* is rewritten in place — same marching behavior, fixed shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wisp_tpu.models.activations import get_activation_class
from wisp_tpu.models.decoders.basic_decoders import BasicDecoder
from wisp_tpu.models.embedders.positional_embedder import get_positional_embedder
from wisp_tpu.models.layers import get_layer_class
from wisp_tpu.models.nefs.base_nef import BaseNeuralField

PRUNE_DENSITY_DECAY_DEFAULT = (0.01 * 512) / float(np.sqrt(3))


class _Identity:
    out_dim = 3

    def __call__(self, x):
        return x


class NeuralRadianceField(BaseNeuralField):
    def __init__(self,
                 grid=None,
                 pos_embedder: str = "none",     # 'none' | 'identity' | 'positional'
                 view_embedder: str = "none",    # 'none' | 'identity' | 'positional'
                 pos_multires: int = 10,
                 view_multires: int = 4,
                 position_input: bool = False,
                 activation_type: str = "relu",
                 layer_type: str = "linear",
                 hidden_dim: int = 128,
                 num_layers: int = 1,
                 bias: bool = False,
                 prune_density_decay: Optional[float] = PRUNE_DENSITY_DECAY_DEFAULT,
                 prune_min_density: Optional[float] = 0.6,
                 prune_grace: int = 1,
                 *,
                 key=None):
        self.grid = grid
        self.pos_embedder_type = pos_embedder
        self.view_embedder_type = view_embedder
        self.pos_embedder, self.pos_embed_dim = self.init_embedder(
            pos_embedder, pos_multires, include_input=position_input)
        self.view_embedder, self.view_embed_dim = self.init_embedder(
            view_embedder, view_multires, include_input=True)

        self.activation_type = activation_type
        self.layer_type = layer_type
        self.hidden_dim = hidden_dim
        self.num_layers = num_layers
        self.bias = bias

        if key is None:
            key = jax.random.PRNGKey(0)
        kd, kc = jax.random.split(key)
        self.decoder_density = BasicDecoder(
            input_dim=self.density_net_input_dim(), output_dim=16,
            activation=get_activation_class(activation_type), bias=bias,
            layer=get_layer_class(self._layer_name(layer_type)),
            num_layers=num_layers, hidden_dim=hidden_dim, skip=[], key=kd)
        if self.decoder_density.lout.bias is not None:
            # Density head bias init: channel 0 starts at 1.0 (reference nerf.py:162-163).
            lout = self.decoder_density.lout
            self.decoder_density = self.decoder_density.replace(
                lout=lout.replace(bias=lout.bias.at[0].set(1.0)))
        self.decoder_color = BasicDecoder(
            input_dim=self.color_net_input_dim(), output_dim=3,
            activation=get_activation_class(activation_type), bias=bias,
            layer=get_layer_class(self._layer_name(layer_type)),
            num_layers=num_layers + 1, hidden_dim=hidden_dim, skip=[], key=kc)

        self.prune_density_decay = prune_density_decay
        self.prune_min_density = prune_min_density
        # Grace period before a below-threshold cell is culled (round-5 erosion fix —
        # results_round4.md postmortem 1): a cull is IRREVERSIBLE in practice (culled cells
        # get no samples, so a gradient-noise dip freezes), but a below-threshold cell that
        # is still marched keeps receiving unbiased gradients and recovers unless it is
        # genuinely dead. With prune_grace=G, a cell is culled only after its keep-score
        # stays below prune_min_density for G CONSECUTIVE prunes (per-cell streak counter,
        # int32, fixed shape). G=1 is the reference behavior (cull on first dip); the
        # stochastic-backward configs require G>1 to not erode long-horizon.
        self.prune_grace = int(prune_grace)
        self.prune_streak = None
        if self.prune_grace > 1 and grid is not None \
                and getattr(grid, "occupancy", None) is not None:
            self.prune_streak = np.zeros(grid.occupancy.shape, np.int32)
        super().__init__()

    @staticmethod
    def _layer_name(layer_type: str) -> str:
        """Accept both reference spellings ('spectral_norm' etc.) and short names."""
        return layer_type.replace("_norm", "")

    def init_embedder(self, embedder_type: str, frequencies: int, include_input: bool):
        if embedder_type == "none" and not include_input:
            return None, 0
        if embedder_type == "identity" or (embedder_type == "none" and include_input):
            return _Identity(), 3
        if embedder_type == "positional":
            return get_positional_embedder(frequencies=frequencies,
                                           include_input=include_input)
        raise NotImplementedError(
            f"Unsupported embedder type for NeuralRadianceField: {embedder_type}")

    def register_forward_functions(self):
        self._register_forward_function(self.rgba, ["density", "rgb"])

    def rgba(self, coords, ray_d, lod_idx=None, max_compute_lod=None):
        """[N,3] coords + [N,3] view dirs -> {'rgb': [N,3], 'density': [N,1]}
        (reference nerf.py:219-264). ``max_compute_lod`` (static) lets tracers cap the
        grid LODs actually computed (spacing-based truncation, see HashGrid.interpolate)."""
        if lod_idx is None:
            lod_idx = len(self.grid.active_lods) - 1
        batch = coords.shape[0]

        if max_compute_lod is not None and getattr(self.grid, "SUPPORTS_COMPUTE_CAP",
                                                   False):
            feats = self.grid.interpolate(coords, lod_idx,
                                          max_compute_lod=max_compute_lod)
        else:
            feats = self.grid.interpolate(coords, lod_idx)
        feats = feats.reshape(batch, self.effective_feature_dim())
        if self.pos_embedder is not None:
            embedded_pos = self.pos_embedder(coords).reshape(batch, self.pos_embed_dim)
            feats = jnp.concatenate([feats, embedded_pos], axis=-1)

        density_feats = self.decoder_density(feats)

        if self.view_embedder is not None:
            embedded_dir = self.view_embedder(ray_d).reshape(batch, self.view_embed_dim)
            fdir = jnp.concatenate([density_feats, embedded_dir], axis=-1)
        else:
            fdir = density_feats

        colors = jax.nn.sigmoid(self.decoder_color(fdir[..., 1:]))
        density = jax.nn.relu(density_feats[..., 0:1])
        return {"rgb": colors, "density": density}

    def effective_feature_dim(self) -> int:
        if self.grid.multiscale_type == "cat":
            return self.grid.feature_dim * self.grid.num_lods
        return self.grid.feature_dim

    def density_net_input_dim(self) -> int:
        return self.effective_feature_dim() + self.pos_embed_dim

    def color_net_input_dim(self) -> int:
        return 15 + self.view_embed_dim

    # -- pruning (reference nerf.py:175-212) ---------------------------------------------------
    def prune(self, key=None, sample_max=None):
        """One pruning step; returns an updated nef (functional). Designed to be jittable:
        occupancy decays, densities are re-queried at one jittered point per dense cell, the
        max is thresholded, and the blas occupancy bitfield is rewritten (fixed shapes —
        no topology rebuild, see module docstring).

        ``sample_max`` (optional, [res**3] f32): per-cell max of the densities the tracer
        computed at TRAINING samples since the last prune (PackedRFTracer
        density_feedback / MultiviewTrainer prune_sample_feedback). The reference's prune
        queries ONE uniform random point per cell (reference nerf.py:186-196) — which the
        reference survives only because it trains WITHOUT early termination, so interiors
        freeze at high density; with in-training early termination the learned density is
        a sub-voxel shell the point query misses, and the 0.95/prune decay then culls the
        most opaque VISIBLE cells (measured round 5: 40.9% of GT surface cells culled by
        epoch 66, erosion 29.1 dB @25 -> 26.3 @50). Max-ing the sampled densities into the
        keep-score makes the prune see exactly what the renderer sees (instant-ngp's
        density-grid update scheme)."""
        if self.prune_density_decay is None or self.prune_min_density is None:
            return self
        grid = self.grid
        if grid is None or grid.occupancy is None:
            return self
        if getattr(grid.blas, "occ_grid", None) is None:
            # level > OCC_GRID_MAX_LEVEL blas has no dense bitfield to rewrite
            # (octree_as.py envelope) — pruning is a no-op there
            return self
        if key is None:
            key = jax.random.PRNGKey(0)

        level = grid.blas.max_level
        res = 2 ** level
        num_cells = grid.occupancy.shape[0]

        occupancy = grid.occupancy * self.prune_density_decay

        # Tracked cells: every cell of the grid's initial occupancy domain — row-major for a
        # dense blas, the sparse morton set otherwise (reference keeps the initial blas's
        # dense_points, hash_grid.py:63-68).
        if grid.blas.dense or grid.blas.points is None:
            cell_ids = jnp.arange(num_cells)
            cx = cell_ids // (res * res)
            cy = (cell_ids // res) % res
            cz = cell_ids % res
            cell_coords = jnp.stack([cx, cy, cz], axis=-1)
        else:
            cell_coords = grid.blas.points[level]
        points = cell_coords.astype(jnp.float32)

        k1, k2 = jax.random.split(key)
        samples = points + jax.random.uniform(k1, (num_cells, 3))
        samples = samples / res * 2.0 - 1.0
        # random view dirs (density is view-independent; arg needed by rgba's signature)
        views = jax.random.normal(k2, (num_cells, 3))
        views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)

        density = jax.lax.stop_gradient(
            self.forward(channels="density", coords=samples, ray_d=views))
        occupancy = jnp.maximum(density[:, 0], occupancy)
        if sample_max is not None:
            # keep-score also sees the max TRAINING-sample density per cell (see docstring)
            flat_ids = (cell_coords[:, 0].astype(jnp.int32) * res
                        + cell_coords[:, 1]) * res + cell_coords[:, 2]
            occupancy = jnp.maximum(occupancy, sample_max[flat_ids])
        below = occupancy <= self.prune_min_density
        if self.prune_grace > 1 and self.prune_streak is not None:
            # grace-period culling (see __init__): cull only after G consecutive
            # below-threshold prunes; any recovery resets the streak (and revives the
            # cell if it was culled — the density re-query covers ALL tracked cells)
            streak = jnp.where(below, self.prune_streak.astype(jnp.int32) + 1, 0)
            mask = streak < self.prune_grace
        else:
            streak = self.prune_streak
            mask = ~below

        # rewrite the bitfield: tracked cells get their new state, everything else stays off.
        # The fused cell-density field powers the tracers' transmittance early-termination
        # estimate and MUST carry the fresh re-queried density (instant-ngp's density
        # grid), NOT `occupancy`: the reference's keep-score update is
        # max(density, occupancy*2.956), which INFLATES ~2.956^k over k prunes — feeding
        # that into tau-hat made the estimate cull everything behind the first occupied
        # cell by prune ~10 and collapsed a 50-epoch run 40 dB -> 20 dB (semi-transparent
        # scenes need interior samples).
        flat = (cell_coords[:, 0].astype(jnp.int32) * res
                + cell_coords[:, 1]) * res + cell_coords[:, 2]
        bitfield = jnp.zeros((res ** 3,), bool).at[flat].set(mask)
        # Density estimate = decayed running max over prune steps (instant-ngp's density
        # grid update: max(new, 0.95*old)) rather than the raw single-jittered-point
        # sample: one noisy low draw in a partially-occupied cell would otherwise
        # underestimate tau-hat for a whole prune interval (and a high draw over-cull
        # samples behind it). NOTE prune_density_decay is the reference's KEEP-SCORE
        # factor (0.01*512/sqrt(3) ≈ 2.956, >1) and must NOT be used here — that is
        # exactly the 2.956^k inflation collapse mode above. The estimate stays bounded
        # by the max fresh density ever seen because only `density` and a <1 decay enter.
        old_dens = grid.blas.cell_density
        prev = jnp.maximum(old_dens[flat], 0.0) if old_dens is not None \
            else jnp.zeros_like(density[:, 0])
        dens_est = jnp.maximum(density[:, 0], 0.95 * prev)
        dens_field = jnp.full((res ** 3,), -1.0, jnp.float32).at[flat].set(
            jnp.where(mask, dens_est, -1.0))
        new_blas = grid.blas.update_occupancy(bitfield, cell_density=dens_field)
        new_grid = grid.replace(occupancy=occupancy, blas=new_blas)
        return self.replace(grid=new_grid, prune_streak=streak)

    def public_properties(self) -> Dict[str, Any]:
        props = {
            "Grid": self.grid.name() if self.grid is not None else None,
            "Pos. Embedding": self.pos_embedder_type,
            "View Embedding": self.view_embedder_type,
            "Decoder (density)": self.decoder_density.public_properties(),
            "Decoder (color)": self.decoder_color.public_properties(),
        }
        if self.prune_density_decay is not None:
            props["Pruning Density Decay"] = self.prune_density_decay
        if self.prune_min_density is not None:
            props["Pruning Min Density"] = self.prune_min_density
        return props
