"""Real-front-end smoke for the interactive layer: the HTML/WebSocket viewer
(wisp_tpu/renderer/web/server.py) serves an actual page, streams real rendered frames over
a real socket, and write-controls round-trip — no stubs (the ipywidgets/ipycanvas presenters
can only be stub-tested in this environment; this covers the live-event-loop path,
reference wisp/renderer/app/wisp_app.py:483-564)."""

import asyncio
import json
import threading
import time
import urllib.request

import pytest

pytestmark = pytest.mark.kernel


@pytest.fixture(scope="module")
def web_server():
    from wisp_tpu.renderer.web.server import WispWebServer, demo_app
    app = demo_app(height=128, width=128)
    server = WispWebServer(app, port=8734)
    thread = threading.Thread(target=lambda: server.serve(max_frames=200))
    thread.start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            urllib.request.urlopen("http://127.0.0.1:8734/healthz", timeout=1)
            break
        except Exception:
            time.sleep(0.25)
    yield server, app
    # drain remaining frames so the render thread exits before the process does
    server._frame_count = max(server._frame_count, 200)
    thread.join(timeout=120)
    assert not thread.is_alive(), "server thread did not stop"


def test_page_and_health(web_server):
    page = urllib.request.urlopen("http://127.0.0.1:8734/").read().decode()
    assert "wisp-tpu viewer" in page and "WebSocket" in page
    assert urllib.request.urlopen("http://127.0.0.1:8734/healthz").read() == b"ok\n"


def test_frames_edits_and_camera_events_round_trip(web_server):
    server, app = web_server

    async def session():
        import websockets
        async with websockets.connect("ws://127.0.0.1:8734/ws") as ws:
            panels = json.loads(await ws.recv())
            assert panels["type"] == "panels"
            titles = {p["title"] for p in panels["panels"]}
            assert {"Camera", "Render settings", "Object: demo"} <= titles

            frame = None
            for _ in range(100):
                m = json.loads(await ws.recv())
                if m["type"] == "frame":
                    frame = m
                    break
            assert frame is not None, "no frame streamed"
            assert len(frame["jpg"]) > 100 and frame["res"][0] >= 64
            assert frame["fps"] >= 0.0

            fov_id = [c["id"] for p in panels["panels"] for c in p["controls"]
                      if "FOV" in c["id"]][0]
            await ws.send(json.dumps({"type": "set", "id": fov_id, "value": 70.0}))
            await ws.send(json.dumps({"type": "drag", "dx": 30, "dy": -10}))
            await ws.send(json.dumps({"type": "scroll", "amount": 1}))
            for _ in range(100):
                m = json.loads(await ws.recv())
                if m["type"] == "panels":
                    new_fov = [c["value"] for p in m["panels"] for c in p["controls"]
                               if "FOV" in c["id"]][0]
                    assert abs(new_fov - 70.0) < 1e-3
                    return
            raise AssertionError("edited panel state never echoed back")

    asyncio.run(session())
    # the camera events actually moved the live camera
    import numpy as np
    assert float(np.degrees(app.render_core.camera.fov)) == pytest.approx(70.0, abs=0.1)
