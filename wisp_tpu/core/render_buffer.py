"""RenderBuffer — dynamic multi-channel pixel/ray payload buffer.

TPU-native counterpart of the reference RenderBuffer (wisp/core/render_buffer.py:22-439).
The reference generates dynamic dataclass subclasses per channel-set; here a RenderBuffer is a
single pytree holding a ``channels`` dict (name -> array), which jit/vmap handle natively while
preserving the same API surface: attribute access for any channel (``rb.rgb``, ``rb.depth``),
``cat``, depth+alpha-aware ``blend``, shape ops, dtype casts, and numpy/image export.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from wisp_tpu.core.channels import Channel, create_default_channel


class RenderBuffer:
    _RESERVED = ("channels",)

    def __init__(self, rgb=None, alpha=None, depth=None, **kwargs):
        channels: Dict[str, jax.Array] = {}
        if rgb is not None:
            channels["rgb"] = rgb
        if alpha is not None:
            channels["alpha"] = alpha
        if depth is not None:
            channels["depth"] = depth
        for k, v in kwargs.items():
            if v is not None:
                channels[k] = v
        object.__setattr__(self, "channels", channels)

    # -- attribute access: rb.rgb, rb.depth, rb.<custom> -------------------------------------
    def __getattr__(self, name):
        channels = object.__getattribute__(self, "channels")
        if name in channels:
            return channels[name]
        if name in ("rgb", "alpha", "depth", "hit", "err", "gt", "normal", "xyz"):
            return None  # default channels read as None when absent (reference :58-84)
        raise AttributeError(f"RenderBuffer has no channel {name!r}")

    def __repr__(self):
        desc = ", ".join(
            f"{k}:{tuple(v.shape)}" for k, v in self.channels.items()
        )
        return f"RenderBuffer({desc})"

    @property
    def rb_channels(self) -> Sequence[str]:
        return tuple(sorted(self.channels.keys()))

    # -- combinators (reference render_buffer.py:174-260) ------------------------------------
    @classmethod
    def cat(cls, buffers: Sequence["RenderBuffer"], axis: int = 0) -> "RenderBuffer":
        keys = set(buffers[0].channels.keys())
        for b in buffers[1:]:
            keys &= set(b.channels.keys())
        out = {}
        for k in keys:
            vals = [b.channels[k] for b in buffers]
            # scalar channels (e.g. sample counters) aggregate by sum rather than concat
            out[k] = sum(vals) if vals[0].ndim == 0 else jnp.concatenate(vals, axis=axis)
        return cls(**out)

    def blend(self, other: "RenderBuffer",
              channel_kit: Optional[Dict[str, Channel]] = None) -> "RenderBuffer":
        """Composite ``self`` (front) over ``other`` using per-channel blend fns, with painter's
        depth ordering when both buffers carry depth (reference render_buffer.py:204-260)."""
        kit = channel_kit or {}
        a1 = self.channels.get("alpha")
        a2 = other.channels.get("alpha")
        if a1 is None:
            a1 = jnp.ones_like(next(iter(self.channels.values()))[..., :1])
        if a2 is None:
            a2 = jnp.ones_like(next(iter(other.channels.values()))[..., :1])

        d1 = self.channels.get("depth")
        d2 = other.channels.get("depth")
        if d1 is not None and d2 is not None:
            # Painter's algorithm: the nearer surface (with coverage) goes in front.
            front_is_self = jnp.logical_or(
                jnp.logical_and(d1 <= d2, a1 > 0), a2 <= 0
            )
        else:
            front_is_self = None

        out = {}
        keys = set(self.channels.keys()) | set(other.channels.keys())
        for k in keys:
            c1 = self.channels.get(k)
            c2 = other.channels.get(k)
            if c1 is None:
                out[k] = c2
                continue
            if c2 is None:
                out[k] = c1
                continue
            ch = kit.get(k, create_default_channel())
            if front_is_self is not None:
                f1, f2 = (jnp.where(front_is_self, c1, c2), jnp.where(front_is_self, c2, c1))
                fa1, fa2 = (jnp.where(front_is_self, a1, a2), jnp.where(front_is_self, a2, a1))
            else:
                f1, f2, fa1, fa2 = c1, c2, a1, a2
            out[k] = ch.blend_fn(f1, f2, fa1, fa2)
        return RenderBuffer(**out)

    # -- shape ops (reference :264-299) ------------------------------------------------------
    def _map(self, fn) -> "RenderBuffer":
        return RenderBuffer(**{k: fn(v) for k, v in self.channels.items()})

    def reshape(self, *dims) -> "RenderBuffer":
        if len(dims) == 1 and isinstance(dims[0], (tuple, list)):
            dims = tuple(dims[0])

        def _reshape(v):
            if v.ndim == 0:
                return v  # scalar channels are layout-free
            if dims[-1] == -1:
                return v.reshape(*dims[:-1], v.shape[-1])
            return v.reshape(*dims)
        return self._map(_reshape)

    def transpose(self) -> "RenderBuffer":
        """Swap the leading two (H, W) dims."""
        return self._map(lambda v: v if v.ndim < 2 else jnp.swapaxes(v, 0, 1))

    def scale(self, size, method: str = "bilinear") -> "RenderBuffer":
        """Resize H, W to ``size`` (reference uses F.interpolate; here jax.image.resize)."""
        def _resize(v):
            out_shape = (*size, v.shape[-1])
            return jax.image.resize(v.astype(jnp.float32), out_shape, method=method).astype(v.dtype)
        return self._map(_resize)

    def __getitem__(self, idx) -> "RenderBuffer":
        return self._map(lambda v: v if v.ndim == 0 else v[idx])

    def astype(self, dtype) -> "RenderBuffer":
        return self._map(lambda v: v.astype(dtype))

    def detach(self) -> "RenderBuffer":
        return self._map(jax.lax.stop_gradient)

    def mean(self) -> "RenderBuffer":
        return self._map(lambda v: jnp.mean(v))

    # -- exports (reference :300-364) --------------------------------------------------------
    def numpy_dict(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.channels.items()}

    def exr_dict(self) -> Dict[str, np.ndarray]:
        """Float channels dict for EXR export: rgb renamed to 'default', scalar (0-dim)
        counters dropped (reference render_buffer.py:311-324; viewable with e.g. tev)."""
        return {("default" if k == "rgb" else k): np.asarray(v, dtype=np.float32)
                for k, v in self.channels.items()
                if v is not None and getattr(v, "ndim", 0) > 0}

    def image(self) -> "RenderBuffer":
        """8-bit displayable buffer: rgb scaled to [0,255], alpha/depth normalized
        (reference render_buffer.py:336-364)."""
        out = {}
        if "rgb" in self.channels:
            out["rgb"] = (jnp.clip(self.channels["rgb"], 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if "alpha" in self.channels:
            out["alpha"] = (jnp.clip(self.channels["alpha"], 0.0, 1.0) * 255.0).astype(jnp.uint8)
        if "depth" in self.channels:
            d = self.channels["depth"]
            lo, hi = jnp.min(d), jnp.max(d)
            dn = jnp.where(hi > lo, (d - lo) / jnp.where(hi > lo, hi - lo, 1.0), jnp.zeros_like(d))
            out["depth"] = (dn * 255.0).astype(jnp.uint8)
        return RenderBuffer(**out)


def _rb_flatten(rb: RenderBuffer):
    keys = tuple(sorted(rb.channels.keys()))
    return [rb.channels[k] for k in keys], keys


def _rb_flatten_with_keys(rb: RenderBuffer):
    keys = tuple(sorted(rb.channels.keys()))
    return [(jtu.DictKey(k), rb.channels[k]) for k in keys], keys


def _rb_unflatten(keys, vals):
    rb = object.__new__(RenderBuffer)
    object.__setattr__(rb, "channels", dict(zip(keys, vals)))
    return rb


jtu.register_pytree_with_keys(
    RenderBuffer, _rb_flatten_with_keys, _rb_unflatten, flatten_func=_rb_flatten
)
