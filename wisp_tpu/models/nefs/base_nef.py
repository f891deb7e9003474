"""BaseNeuralField — channel-based forward dispatch.

Counterpart of reference wisp/models/nefs/base_nef.py:16-209. Subclasses register forward
functions mapped to the channel sets they produce (``register_forward_functions``); the
``forward(channels=...)`` entry picks the minimal set of functions covering the request and
filters kwargs per-function by signature inspection. All registration happens at construction
(host-side); inside jit only the selected pure functions run, wrapped in ``jax.named_scope``
(the NVTX-range equivalent, reference base_nef.py:159-192).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Iterable, List, Optional, Set, Union

import jax

from wisp_tpu.core.module import Module


class BaseNeuralField(Module):
    def __init__(self):
        # dict: forward fn name -> (fn, set of channels it outputs)
        self._forward_functions: Dict[str, Any] = {}
        self.register_forward_functions()
        self._supported_channels = set()
        for fn_name, (_, channels) in self._forward_functions.items():
            self._supported_channels |= set(channels)

    # -- registration API (reference base_nef.py:57-83) ---------------------------------------
    def register_forward_functions(self):
        """Subclasses call self._register_forward_function(fn, channels) here."""
        raise NotImplementedError

    def _register_forward_function(self, fn: Callable, channels: Union[str, Iterable[str]]):
        if isinstance(channels, str):
            channels = [channels]
        self._forward_functions[fn.__name__] = (fn.__name__, tuple(sorted(channels)))

    def get_supported_channels(self) -> Set[str]:
        return set(self._supported_channels)

    def get_forward_function(self, channel: str) -> Callable:
        """The forward function producing ``channel``, wrapped to return only that channel
        (reference base_nef.py:85-107)."""
        for fn_name, channels in self._forward_functions.values():
            if channel in channels:
                fn = getattr(self, fn_name)

                def wrapped(*args, _fn=fn, **kwargs):
                    res = self._filter_call(_fn, *args, **kwargs)
                    return res[channel] if isinstance(res, dict) else res
                return wrapped
        raise ValueError(f"Channel {channel!r} is not supported by {self.name()}")

    def prune(self):
        """Occupancy pruning hook (reference base_nef.py:109-117); override in subclasses."""
        return self

    # -- dispatch (reference base_nef.py:120-202) ----------------------------------------------
    def _filter_call(self, fn, *args, **kwargs):
        sig = inspect.signature(fn)
        accepted = set(sig.parameters.keys())
        filtered = {k: v for k, v in kwargs.items() if k in accepted}
        return fn(*args, **filtered)

    def forward(self, channels: Optional[Union[str, List[str]]] = None, **kwargs):
        """Compute the requested channels.

        Returns a single array for a str request, else a dict {channel: array}.
        """
        if channels is None:
            requested = set(self._supported_channels)
        elif isinstance(channels, str):
            requested = {channels}
        else:
            requested = set(channels)

        unsupported = requested - self._supported_channels
        if unsupported:
            raise ValueError(
                f"Channels {sorted(unsupported)} are not supported by {self.name()}; "
                f"supported: {sorted(self._supported_channels)}")

        # Minimal set of forward functions covering the request (greedy by coverage).
        remaining = set(requested)
        selected = []
        for fn_name, channels_out in self._forward_functions.values():
            if remaining & set(channels_out):
                selected.append((fn_name, channels_out))
                remaining -= set(channels_out)
            if not remaining:
                break

        out: Dict[str, Any] = {}
        for fn_name, channels_out in selected:
            fn = getattr(self, fn_name)
            with jax.named_scope(f"{self.name()}.{fn_name}"):
                result = self._filter_call(fn, **kwargs)
            if not isinstance(result, dict):
                (only,) = tuple(channels_out)
                result = {only: result}
            for ch in requested & set(result.keys()):
                out[ch] = result[ch]

        if isinstance(channels, str):
            return out[channels]
        return out

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def public_properties(self) -> Dict[str, Any]:
        return {"Supported channels": sorted(self._supported_channels)}
