from wisp_tpu.renderer.core.render_core import RendererCore, ListTLAS, TLAS
