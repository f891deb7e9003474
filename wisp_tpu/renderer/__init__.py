from wisp_tpu.renderer.core.render_core import RendererCore, ListTLAS, TLAS
from wisp_tpu.renderer.app.wisp_app import WispApp, DiskPresenter, FramePresenter
from wisp_tpu.renderer.app.optimization_app import OptimizationApp


def web_server(app, **kw):
    """Lazy accessor for the HTML/WebSocket front-end (renderer/web/server.py) — imported
    on demand so headless deployments don't pay for the websockets import."""
    from wisp_tpu.renderer.web.server import WispWebServer
    return WispWebServer(app, **kw)
