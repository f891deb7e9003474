"""Self-contained HTML/WebSocket front-end for the interactive renderer.

The reference's interactive stack is glumpy/GLFW + imgui over CUDA-GL interop
(wisp/renderer/app/wisp_app.py:40-769) — none of which exists on a headless TPU pod. This
module provides the real front-end for that layer: a single-port web server (``websockets``
handles both the page and the socket) that

* streams rendered frames (JPEG over the socket) into an HTML canvas,
* forwards mouse drag / wheel / keyboard events back to the app's camera controller
  (WispApp.on_mouse_drag / on_mouse_scroll / on_key — the reference's event surface,
  wisp_app.py:612-743),
* renders every :class:`wisp_tpu.renderer.gui.controls.Control` panel as live HTML inputs
  whose edits write through to the shared WispState (the imgui property-panel parity
  surface), and
* reports the measured render FPS so the RendererCore's FPS-adaptive resolution
  (render_core.py:92-106, reference render_core.py:227-285) operates against a real
  event loop.

Run standalone: ``python -m wisp_tpu.renderer.web.server`` (demo scene), or attach to any
WispApp via ``WispWebServer(app).serve()``.
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import logging
import time
from typing import Dict, Optional

import numpy as np

from wisp_tpu.renderer.app.wisp_app import FramePresenter, WispApp
from wisp_tpu.renderer.gui.controls import Control, all_panels

log = logging.getLogger(__name__)

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>wisp-tpu viewer</title>
<style>
 body { margin:0; display:flex; font-family:system-ui,sans-serif; background:#16161a; color:#e4e4e7; }
 #view { flex:1; display:flex; flex-direction:column; align-items:center; padding:12px; }
 #canvas { background:#000; max-width:100%; cursor:grab; }
 #status { font-size:12px; color:#a1a1aa; padding:6px; }
 #panels { width:310px; overflow-y:auto; height:100vh; background:#1f1f27; padding:10px; box-sizing:border-box; }
 .panel h3 { font-size:13px; margin:12px 0 4px; color:#fbbf24; }
 .ctl { display:flex; align-items:center; font-size:12px; margin:3px 0; gap:6px; }
 .ctl label { flex:0 0 110px; }
 .ctl input[type=range] { flex:1; }
 .ctl .val { flex:0 0 44px; text-align:right; color:#a5b4fc; }
 select,button { background:#27272f; color:#e4e4e7; border:1px solid #3f3f46; border-radius:4px; }
</style></head><body>
<div id="view">
  <img id="canvas" draggable="false">
  <div id="status">connecting…</div>
</div>
<div id="panels"></div>
<script>
const ws = new WebSocket(`ws://${location.host}/ws`);
const img = document.getElementById('canvas');
const status = document.getElementById('status');
let frames = 0, t0 = performance.now();
ws.onmessage = (ev) => {
  const m = JSON.parse(ev.data);
  if (m.type === 'frame') {
    img.src = 'data:image/jpeg;base64,' + m.jpg;
    frames++;
    const dt = (performance.now() - t0) / 1000;
    const clientFps = (frames / Math.max(dt, 1e-3)).toFixed(1);
    status.textContent = `step ${m.step} · render ${m.res[0]}x${m.res[1]} · ` +
      `server ${m.fps.toFixed(1)} fps · client ${clientFps} fps`;
    status.dataset.step = m.step; status.dataset.fps = m.fps;
    status.dataset.resx = m.res[0]; status.dataset.resy = m.res[1];
  } else if (m.type === 'panels') {
    renderPanels(m.panels);
  }
};
function send(o) { if (ws.readyState === 1) ws.send(JSON.stringify(o)); }
function renderPanels(panels) {
  const root = document.getElementById('panels');
  root.innerHTML = '';
  for (const p of panels) {
    const div = document.createElement('div'); div.className = 'panel';
    div.innerHTML = `<h3>${p.title}</h3>`;
    for (const c of p.controls) {
      const row = document.createElement('div'); row.className = 'ctl';
      const label = document.createElement('label'); label.textContent = c.name;
      label.title = c.help || ''; row.appendChild(label);
      let input;
      if (c.kind === 'float' || c.kind === 'int') {
        input = document.createElement('input'); input.type = 'range';
        input.min = c.min; input.max = c.max; input.step = c.step; input.value = c.value;
        const val = document.createElement('span'); val.className = 'val';
        val.textContent = c.value;
        input.oninput = () => { val.textContent = input.value; };
        input.onchange = () => send({type:'set', id:c.id, value:parseFloat(input.value)});
        row.appendChild(input); row.appendChild(val);
      } else if (c.kind === 'toggle') {
        input = document.createElement('input'); input.type = 'checkbox';
        input.checked = !!c.value;
        input.onchange = () => send({type:'set', id:c.id, value:input.checked});
        row.appendChild(input);
      } else if (c.kind === 'dropdown') {
        input = document.createElement('select');
        for (const o of c.options) {
          const opt = document.createElement('option');
          opt.value = o; opt.textContent = o; opt.selected = (o === c.value);
          input.appendChild(opt);
        }
        input.onchange = () => send({type:'set', id:c.id, value:input.value});
        row.appendChild(input);
      } else if (c.kind === 'button') {
        input = document.createElement('button'); input.textContent = 'run';
        input.onclick = () => send({type:'set', id:c.id, value:null});
        row.appendChild(input);
      }
      input.id = c.id;
      div.appendChild(row);
    }
    root.appendChild(div);
  }
}
let drag = null;
img.onmousedown = (e) => { drag = [e.clientX, e.clientY]; };
window.onmouseup = () => { drag = null; };
window.onmousemove = (e) => {
  if (!drag) return;
  send({type:'drag', dx: e.clientX - drag[0], dy: e.clientY - drag[1]});
  drag = [e.clientX, e.clientY];
};
img.onwheel = (e) => { e.preventDefault(); send({type:'scroll', amount: -Math.sign(e.deltaY)}); };
window.onkeydown = (e) => send({type:'key', key: e.key});
</script></body></html>
"""


def _encode_jpeg(frame: np.ndarray, quality: int = 85) -> str:
    from PIL import Image
    arr = np.asarray(frame)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return base64.b64encode(buf.getvalue()).decode("ascii")


class WebPresenter(FramePresenter):
    """FramePresenter that hands frames to the web server's broadcast queue."""

    def __init__(self, server: "WispWebServer"):
        self.server = server

    def present(self, frame: np.ndarray, step: int) -> None:
        self.server.latest = (frame, step)


class WispWebServer:
    """One-port HTTP+WebSocket server around a WispApp (see module docstring)."""

    def __init__(self, app: WispApp, host: str = "127.0.0.1", port: int = 8711,
                 jpeg_quality: int = 85, bg_ticks_per_frame: int = 1):
        self.app = app
        self.host = host
        self.port = port
        self.jpeg_quality = jpeg_quality
        # background (training) iterations per rendered frame — the reference's
        # render_every=25 idle-tick ratio (optimization_app.py run loop)
        self.bg_ticks_per_frame = bg_ticks_per_frame
        self.latest = None                     # (frame ndarray, step)
        self._stopping = False
        self.connections: set = set()
        self._controls: Dict[str, Control] = {}
        self._frame_count = 0
        app.presenter = WebPresenter(self)
        # a web front-end is a live event loop: enable interactive mode so the
        # RendererCore's FPS-adaptive resolution engages
        app.wisp_state.renderer.interactive_mode = True

    # -- control registry ------------------------------------------------------------------
    def _panels_message(self) -> str:
        panels = []
        self._controls.clear()
        for title, controls in all_panels(self.app).items():
            rows = []
            for c in controls:
                cid = f"{title}/{c.name}"
                self._controls[cid] = c
                value = None
                if c.get is not None:
                    try:
                        value = c.get()
                    except Exception:   # control may be momentarily unbound
                        value = None
                rows.append({"id": cid, "name": c.name, "kind": c.kind, "value": value,
                             "min": c.min, "max": c.max, "step": c.step,
                             "options": list(c.options) if c.options else None,
                             "help": c.help})
            panels.append({"title": title, "controls": rows})
        return json.dumps({"type": "panels", "panels": panels})

    def _apply(self, msg: dict) -> None:
        t = msg.get("type")
        if t == "set":
            ctl = self._controls.get(msg.get("id", ""))
            if ctl is None or ctl.set is None:
                return
            if ctl.kind == "button":
                ctl.set()
            elif ctl.kind == "int":
                ctl.set(int(msg["value"]))
            else:
                ctl.set(msg["value"])
        elif t == "drag":
            self.app.on_mouse_drag(float(msg.get("dx", 0)), float(msg.get("dy", 0)))
        elif t == "scroll":
            self.app.on_mouse_scroll(float(msg.get("amount", 0)))
        elif t == "key":
            self.app.on_key(msg.get("key", ""))

    # -- protocol --------------------------------------------------------------------------
    async def _ws_handler(self, connection) -> None:
        self.connections.add(connection)
        try:
            await connection.send(self._panels_message())
            async for raw in connection:
                try:
                    self._apply(json.loads(raw))
                except Exception as e:   # a bad client message must not kill the app loop
                    log.warning("web control message failed: %s", e)
                    continue
                # reflect the edit back (values may be coupled, e.g. resolution/aspect)
                await connection.send(self._panels_message())
        finally:
            self.connections.discard(connection)

    async def _process_request(self, connection, request):
        if request.path == "/ws":
            return None                      # proceed with the websocket handshake
        if request.path in ("/", "/index.html"):
            return connection.respond(200, _PAGE)
        if request.path == "/healthz":
            return connection.respond(200, "ok\n")
        return connection.respond(404, "not found\n")

    async def _render_loop(self, max_frames: Optional[int], idle_sleep: float) -> None:
        from websockets.asyncio.server import broadcast
        import concurrent.futures
        loop = asyncio.get_running_loop()
        # created eagerly: lazy ThreadPoolExecutor construction can race interpreter
        # shutdown when serve() runs on a non-main thread
        executor = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        while not self._stopping and (max_frames is None
                                      or self._frame_count < max_frames):
            t0 = time.time()
            # run the blocking jax compute off the event loop so HTTP/WS stay responsive
            # while a frame (or its first compile) is in flight
            def tick():
                for _ in range(self.bg_ticks_per_frame):
                    self.app._run_background_tasks()
                return self.app.render()
            try:
                frame = await loop.run_in_executor(executor, tick)
            except RuntimeError as e:
                if "shutdown" in str(e):
                    break   # interpreter shutdown while serving from a daemon thread
                log.exception("render tick failed")
                raise
            self.app.presenter.present(frame, self._frame_count)
            self._frame_count += 1
            if self.connections and self.latest is not None:
                arr, step = self.latest
                msg = json.dumps({
                    "type": "frame", "step": step,
                    "jpg": _encode_jpeg(arr, self.jpeg_quality),
                    "fps": self.app.wisp_state.renderer.fps or 0.0,
                    "res": [int(arr.shape[1]), int(arr.shape[0])]})
                broadcast(self.connections, msg)
            # yield so client messages interleave between frames
            await asyncio.sleep(idle_sleep if not self.connections else 0.0)
        # leaving the loop: wind down a background precompile before the process can
        # exit (tearing down XLA while the thread is mid-jit aborts the runtime)
        self.app.render_core.stop_precompile()

    async def _serve(self, max_frames: Optional[int], idle_sleep: float) -> None:
        from websockets.asyncio.server import serve
        async with serve(self._ws_handler, self.host, self.port,
                         process_request=self._process_request) as server:
            self._server = server
            log.info("wisp-tpu web viewer on http://%s:%d/", self.host, self.port)
            await self._render_loop(max_frames, idle_sleep)

    def serve(self, max_frames: Optional[int] = None, idle_sleep: float = 0.05,
              precompile: bool = True) -> None:
        """Run the app + server until ``max_frames`` frames rendered (None = forever).

        ``precompile`` kicks off the resolution-ladder warm-start on a background thread
        before the loop starts (render_core.precompile): remote XLA compiles overlap
        training ticks, and _prepare_payload serves the largest already-warm rung so the
        first presented frame never blocks ~30 s on a cold full-res compile."""
        if precompile:
            self.app.render_core.precompile()
        asyncio.run(self._serve(max_frames, idle_sleep))

    def request_stop(self) -> None:
        """Stop the render loop after the in-flight frame (thread-safe)."""
        self._stopping = True


def demo_app(height: int = 256, width: int = 256) -> WispApp:
    """A self-contained demo: an SPCField pipeline (solid colored sphere voxels) in an
    interactive WispApp — used by the standalone entry point and the web smoke tests."""
    from wisp_tpu.accelstructs import OctreeAS
    from wisp_tpu.framework.state import WispState
    from wisp_tpu.models.nefs.spc_field import SPCField
    from wisp_tpu.models.pipeline import Pipeline
    from wisp_tpu.ops.mesh import make_sphere_mesh, sample_surface
    from wisp_tpu.ops.spc import pointcloud_to_octree
    from wisp_tpu.tracers import PackedSPCTracer

    v, f = make_sphere_mesh(radius=0.6, subdivisions=3)
    samples = sample_surface(v, f, 200000)
    colors = (samples + 1.0) / 2.0
    codes_per_level, cell_colors = pointcloud_to_octree(samples, 6, attributes=colors)
    pipeline = Pipeline(nef=SPCField(blas=OctreeAS(codes_per_level), colors=cell_colors),
                        tracer=PackedSPCTracer())
    state = WispState()
    state.renderer.canvas_width = width
    state.renderer.canvas_height = height
    state.renderer.target_fps = 2.0
    state.graph.neural_pipelines["demo"] = pipeline
    return WispApp(state)


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser(description="wisp-tpu web viewer demo")
    parser.add_argument("--port", type=int, default=8711)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--platform", default="cpu",
                        help="jax platform for the demo (cpu keeps the TPU free; the env "
                             "var alone does not stick on remote-TPU hosts)")
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=logging.INFO)
    WispWebServer(demo_app(), host=args.host, port=args.port).serve(max_frames=args.frames)
