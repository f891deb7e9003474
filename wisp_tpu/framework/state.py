"""WispState — the shared state object gluing trainers, renderers and guis.

Counterpart of reference wisp/framework/state.py:41-270. Plain mutable dataclasses (host-side;
never traced) with watched fields for pub-sub updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np

from wisp_tpu.core.channels import Channel, channels_starter_kit
from wisp_tpu.framework.event import watchedfields


@watchedfields
@dataclasses.dataclass
class InteractiveRendererState:
    """Canvas / renderer settings (reference state.py:41-139)."""
    fps: float = 0.0
    dt: float = 0.0
    cam_controller: Any = None
    selected_camera: Any = None
    selected_camera_lens: str = "perspective"
    canvas_height: int = 720
    canvas_width: int = 1280
    target_fps: Optional[float] = 24.0
    device: Any = None
    selected_canvas_channel: str = "rgb"
    available_canvas_channels: List[str] = dataclasses.field(default_factory=lambda: ["rgb"])
    antialiasing: str = "msaa_4x"
    clear_color_value: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    canvas_dirty: bool = False
    interactive_mode: bool = False
    enable_amp: bool = True
    reference_grids: List[str] = dataclasses.field(default_factory=lambda: ["xz"])


@watchedfields
@dataclasses.dataclass
class BottomLevelRendererState:
    """Per-object renderer state in the scene graph (reference state.py:141-174)."""
    renderer: Any = None
    features: Optional[Dict] = None
    setup_args: Dict = dataclasses.field(default_factory=dict)
    status: str = "pending"  # 'pending' | 'loaded' | 'ignored'


@watchedfields
@dataclasses.dataclass
class SceneGraphState:
    """Scene graph contents (reference state.py:177-205)."""
    neural_pipelines: Dict[str, Any] = dataclasses.field(default_factory=dict)
    bl_renderers: Dict[str, BottomLevelRendererState] = dataclasses.field(default_factory=dict)
    cameras: Dict[str, Any] = dataclasses.field(default_factory=dict)
    visible_objects: Dict[str, bool] = dataclasses.field(default_factory=dict)
    channels: Dict[str, Channel] = dataclasses.field(default_factory=channels_starter_kit)


@watchedfields
@dataclasses.dataclass
class OptimizationState:
    """Training progress state (reference state.py:207-253)."""
    running: bool = False
    epoch: int = 0
    iteration: int = 0
    iterations_per_epoch: int = 0
    max_epochs: int = 0
    elapsed_time: float = 0.0
    losses: Dict[str, List[float]] = dataclasses.field(default_factory=dict)
    metrics: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train_data: List[Any] = dataclasses.field(default_factory=list)
    validation_data: List[Any] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class WispState:
    """Root shared state (reference state.py:256-270)."""
    renderer: InteractiveRendererState = dataclasses.field(
        default_factory=InteractiveRendererState)
    graph: SceneGraphState = dataclasses.field(default_factory=SceneGraphState)
    optimization: OptimizationState = dataclasses.field(default_factory=OptimizationState)
    extent: Dict[str, Any] = dataclasses.field(default_factory=dict)
