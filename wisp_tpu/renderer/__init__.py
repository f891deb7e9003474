from wisp_tpu.renderer.core.render_core import RendererCore, ListTLAS, TLAS
from wisp_tpu.renderer.app.wisp_app import WispApp, DiskPresenter, FramePresenter
from wisp_tpu.renderer.app.optimization_app import OptimizationApp
