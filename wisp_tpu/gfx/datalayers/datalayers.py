"""Datalayers base (reference wisp/gfx/datalayers/datalayers.py): debug-visualization
generators producing PrimitivesPack line/point batches from scene objects."""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict

from wisp_tpu.core.primitives import PrimitivesPack


class Datalayers(ABC):
    @abstractmethod
    def needs_redraw(self, *args, **kwargs) -> bool:
        ...

    @abstractmethod
    def regenerate_data_layers(self, *args, **kwargs) -> Dict[str, PrimitivesPack]:
        ...
