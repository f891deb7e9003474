"""BaseTracer — channel negotiation + default-arg injection.

Counterpart of reference wisp/tracers/base_tracer.py:17-169. ``forward`` validates the nef
supplies the tracer's required channels, splits the request into tracer-supported + extra
channels, merges call kwargs with tracer-instance defaults by signature inspection, and
dispatches ``trace`` inside a named scope (NVTX-range equivalent). All negotiation is
host-side; only ``trace`` builds traced computation.
"""

from __future__ import annotations

import inspect
from abc import abstractmethod
from typing import Any, Dict, Optional, Set, Tuple

import jax

from wisp_tpu.core.module import Module
from wisp_tpu.core.rays import Rays


class BaseTracer(Module):
    def __init__(self, bg_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)):
        self.bg_color = tuple(bg_color)

    @abstractmethod
    def get_supported_channels(self) -> Set[str]:
        """Channels this tracer can output."""

    @abstractmethod
    def get_required_nef_channels(self) -> Set[str]:
        """Channels the neural field must supply."""

    @abstractmethod
    def trace(self, nef, rays, channels, extra_channels, **kwargs):
        """Produce a RenderBuffer from the neural field."""

    def forward(self, nef, rays: Rays, channels=None, **kwargs):
        nef_channels = nef.get_supported_channels()
        unsupported_inputs = set(self.get_required_nef_channels()) - nef_channels
        if unsupported_inputs:
            raise Exception(
                f"The neural field class {type(nef)} does not output the required channels "
                f"{unsupported_inputs}.")

        if channels is None:
            requested_channels = set(self.get_supported_channels())
        elif isinstance(channels, str):
            requested_channels = {channels}
        else:
            requested_channels = set(channels)
        extra_channels = requested_channels - set(self.get_supported_channels())
        unsupported_outputs = extra_channels - nef_channels
        if unsupported_outputs:
            raise Exception(
                f"Channels {unsupported_outputs} are not supported in the tracer "
                f"{type(self)} or neural field {type(nef)}.")

        # Merge kwargs with tracer-instance defaults by trace() signature
        # (reference base_tracer.py:136-159).
        base_args = set(inspect.signature(BaseTracer.trace).parameters) - {"self"}
        optional_args = [a for a in inspect.signature(self.trace).parameters
                         if a not in base_args and a not in ("self", "args", "kwargs")]
        input_args = {}
        for arg in optional_args:
            if arg in kwargs:
                input_args[arg] = kwargs[arg]
            else:
                default = getattr(self, arg, None)
                if default is not None:
                    input_args[arg] = default
        with jax.named_scope("Tracer.trace"):
            return self.trace(nef, rays, requested_channels, extra_channels, **input_args)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def public_properties(self) -> Dict[str, Any]:
        return {}
