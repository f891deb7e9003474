"""GUI property widgets — front-end-agnostic data providers.

Counterpart of reference wisp/renderer/gui/imgui/ (~1400 LoC of imgui panels: gpu stats,
optimization loss plots, scene-graph tree, per-object property editors). There is no display
stack on TPU pods, so each widget here produces a structured dict from the shared WispState —
the same ``public_properties()`` introspection surface the reference renders with imgui —
which any front-end (jupyter HTML, rich-text console, web) can display.
``render_dashboard_text`` assembles a plain-text dashboard for headless logs.
"""

from __future__ import annotations

from typing import Any, Dict

from wisp_tpu.framework.state import WispState


class Widget:
    def paint(self, state: WispState) -> Dict[str, Any]:
        raise NotImplementedError


class WidgetGPUStats(Widget):
    """Device stats (reference WidgetGPUStats uses pynvml; here jax device memory stats)."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        import jax
        dev = jax.devices()[0]
        out = {"Device": str(dev), "Platform": dev.platform}
        try:
            stats = dev.memory_stats() or {}
            if "bytes_in_use" in stats:
                out["Memory in use (MB)"] = round(stats["bytes_in_use"] / 2 ** 20, 1)
            if "bytes_limit" in stats:
                out["Memory limit (MB)"] = round(stats["bytes_limit"] / 2 ** 20, 1)
        except Exception:  # noqa: BLE001 - not all backends expose stats
            pass
        out["FPS"] = round(state.renderer.fps, 2)
        return out


class WidgetOptimization(Widget):
    """Training progress + loss trends (reference optimization widget w/ plots +
    pause toggle — the toggle lives on OptimizationApp.toggle_training)."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        opt = state.optimization
        losses = {name: (vals[-1] if vals else None)
                  for name, vals in opt.losses.items()}
        return {
            "Running": opt.running,
            "Epoch": f"{opt.epoch}/{opt.max_epochs}",
            "Iteration": f"{opt.iteration}/{opt.iterations_per_epoch}",
            "Elapsed (s)": round(opt.elapsed_time, 1),
            "Losses": losses,
            "Loss history": dict(opt.losses),
        }


class WidgetSceneGraph(Widget):
    """Scene-graph tree with per-object properties (reference scene graph widget)."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        objects = {}
        for name, pipeline in state.graph.neural_pipelines.items():
            props: Dict[str, Any] = {"Visible": state.graph.visible_objects.get(name, True)}
            if hasattr(pipeline, "public_properties"):
                props.update(pipeline.public_properties())
            nef = getattr(pipeline, "nef", None)
            if nef is not None and hasattr(nef, "public_properties"):
                props["Field"] = nef.public_properties()
            objects[name] = props
        return {"Objects": objects,
                "Cameras": list(state.graph.cameras.keys()),
                "Channels": sorted(state.graph.channels.keys())}


class WidgetInteractiveVisualizerProperties(Widget):
    """Canvas/render settings (reference visualizer properties widget)."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        r = state.renderer
        return {
            "Canvas": f"{r.canvas_width}x{r.canvas_height}",
            "Target FPS": r.target_fps,
            "Channel": r.selected_canvas_channel,
            "Available channels": list(r.available_canvas_channels),
            "Interactive mode": r.interactive_mode,
        }


class WidgetAccelstruct(Widget):
    """Per-object acceleration-structure properties (reference
    widget_octree_grid/widget_object_properties accelstruct panels): octree level,
    per-level occupancy vs capacity, dense-field envelope."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        objects = {}
        for name, pipeline in state.graph.neural_pipelines.items():
            nef = getattr(pipeline, "nef", None)
            grid = getattr(nef, "grid", None)
            blas = getattr(grid, "blas", None)
            if blas is None:
                continue
            props: Dict[str, Any] = {}
            if hasattr(blas, "public_properties"):
                props.update(blas.public_properties())
            if hasattr(blas, "occupancy") and hasattr(blas, "capacity"):
                occ, cap = blas.occupancy(), blas.capacity()
                props["Cells by level"] = {
                    f"L{lv}": f"{o}/{c} ({100.0 * o / max(c, 1):.1f}%)"
                    for lv, (o, c) in enumerate(zip(occ, cap))}
            if getattr(blas, "occ_grid", None) is not None:
                props["Dense bitfield"] = f"{int(blas.occ_grid.sum())} occupied cells"
            objects[name] = props
        return {"Acceleration structures": objects}


class WidgetNeuralPipeline(Widget):
    """Per-object pipeline editor data (reference widget_neural_pipeline /
    widget_property_editor): grid + decoder properties and trainable parameter counts."""

    @staticmethod
    def _param_count(module) -> int:
        import jax
        import numpy as np
        total = 0
        for leaf in jax.tree_util.tree_leaves(module):
            if hasattr(leaf, "dtype") and np.issubdtype(np.asarray(leaf).dtype,
                                                        np.inexact):
                total += int(np.prod(leaf.shape))
        return total

    def paint(self, state: WispState) -> Dict[str, Any]:
        objects = {}
        for name, pipeline in state.graph.neural_pipelines.items():
            nef = getattr(pipeline, "nef", None)
            tracer = getattr(pipeline, "tracer", None)
            props: Dict[str, Any] = {}
            if nef is not None:
                props["Field"] = nef.public_properties() \
                    if hasattr(nef, "public_properties") else type(nef).__name__
                grid = getattr(nef, "grid", None)
                if grid is not None:
                    props["Grid params"] = self._param_count(grid)
                props["Total params"] = self._param_count(nef)
            if tracer is not None and hasattr(tracer, "public_properties"):
                props["Tracer"] = tracer.public_properties()
            objects[name] = props
        return {"Pipelines": objects}


class WidgetCameraProperties(Widget):
    """Active-camera properties (reference widget_cameras panel)."""

    def paint(self, state: WispState) -> Dict[str, Any]:
        cam = state.renderer.selected_camera
        if cam is None:
            return {"Camera": None}
        import numpy as np
        return {"Lens": getattr(cam, "lens", "pinhole"),
                "Resolution": f"{cam.width}x{cam.height}",
                "FOV (deg)": round(float(np.degrees(getattr(cam, "fov", 0.0))), 2),
                "Eye": np.asarray(cam.eye()).round(3).tolist()
                if callable(getattr(cam, "eye", None)) else None}


class WidgetObjectTransform(Widget):
    """Model-matrix editor data (reference object transform widget)."""

    def __init__(self, transform=None):
        self.transform = transform

    def paint(self, state: WispState) -> Dict[str, Any]:
        import numpy as np
        if self.transform is None:
            return {}
        return {"Model matrix": np.asarray(self.transform.model_matrix()).tolist()}


def render_dashboard_text(state: WispState) -> str:
    """Assemble all widgets into a plain-text dashboard (headless front-end)."""
    lines = []
    for widget in (WidgetGPUStats(), WidgetOptimization(), WidgetSceneGraph(),
                   WidgetInteractiveVisualizerProperties(), WidgetAccelstruct(),
                   WidgetNeuralPipeline(), WidgetCameraProperties()):
        lines.append(f"== {type(widget).__name__} ==")
        data = widget.paint(state)
        for k, v in data.items():
            if k == "Loss history":
                continue
            lines.append(f"  {k}: {v}")
    return "\n".join(lines)
