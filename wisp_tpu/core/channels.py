"""Channel descriptors for RenderBuffer channels.

Counterpart of the reference's Channel/channels_starter_kit (wisp/core/channels.py:17-85):
a ``Channel`` bundles how a named render channel is blended when compositing objects and how it
is normalized to displayable [0,1] range.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from wisp_tpu.core import channel_fn


@dataclasses.dataclass
class Channel:
    blend_fn: Callable = channel_fn.blend_normal
    normalize_fn: Callable = channel_fn.identity
    min_val: Optional[float] = None
    max_val: Optional[float] = None


def channels_starter_kit() -> dict:
    """Default channel kit mirroring the reference (wisp/core/channels.py:45-85):
    rgb / alpha / depth / normal / hit / err / gt + ray origin/dir debug channels."""
    return {
        "rgb": Channel(
            blend_fn=channel_fn.blend_alpha_composite_over,
            normalize_fn=channel_fn.identity,
            min_val=0.0,
            max_val=1.0,
        ),
        "alpha": Channel(
            blend_fn=channel_fn.blend_alpha_composite_over,
            normalize_fn=channel_fn.identity,
            min_val=0.0,
            max_val=1.0,
        ),
        "depth": Channel(
            blend_fn=channel_fn.blend_normal,
            normalize_fn=channel_fn.normalize_linear_scale,
        ),
        "normal": Channel(
            blend_fn=channel_fn.blend_alpha_slerp,
            normalize_fn=channel_fn.normalize_vector,
            min_val=-1.0,
            max_val=1.0,
        ),
        "hit": Channel(
            blend_fn=channel_fn.blend_logical_or,
            normalize_fn=channel_fn.identity,
        ),
        "err": Channel(
            blend_fn=channel_fn.blend_add,
            normalize_fn=channel_fn.normalize_log_scale,
        ),
        "gt": Channel(
            blend_fn=channel_fn.blend_normal,
            normalize_fn=channel_fn.identity,
            min_val=0.0,
            max_val=1.0,
        ),
        "ray_o": Channel(normalize_fn=channel_fn.normalize_vector),
        "ray_d": Channel(normalize_fn=channel_fn.normalize_vector),
    }


def create_default_channel() -> Channel:
    """Default channel for custom / unknown channel names (channels.py:88-93)."""
    return Channel(
        blend_fn=channel_fn.blend_normal,
        normalize_fn=channel_fn.normalize_linear_scale,
    )
