from wisp_tpu.renderer.core.api.base_renderer import (BottomLevelRenderer, RayTracedRenderer,
                                                      FramePayload)
from wisp_tpu.renderer.core.api.decorators import field_renderer, registered_renderers
from wisp_tpu.renderer.core.api.renderers_factory import create_neural_field_renderer
from wisp_tpu.renderer.core.api.scenegraph import (add_to_scene_graph,
                                                   remove_from_scene_graph, request_redraw)
