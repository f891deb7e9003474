from wisp_tpu.framework.state import (WispState, InteractiveRendererState,
                                      BottomLevelRendererState, SceneGraphState,
                                      OptimizationState)
from wisp_tpu.framework.event import watch, unwatch, watchedfields
