from wisp_tpu.renderer.gui.widgets import (WidgetInteractiveVisualizerProperties,
                                           WidgetGPUStats, WidgetOptimization,
                                           WidgetSceneGraph, WidgetObjectTransform,
                                           render_dashboard_text)
