"""Interactive progressive viewer — the optional local-preview analogue of
the reference's GLFW window + WASD/mouse controls (src/Window.cpp,
Raytracer.cpp:159-245; SURVEY.md §2a 'Window & input').

TPU hosts are headless, so the "window" is a tiny stdlib HTTP server: the
browser shows the progressive render (auto-refresh) and forwards key
presses; the render loop accumulates samples in a background thread and
resets on camera moves exactly like the reference (any movement resets
accumulation, Raytracer.cpp:184-227).

Keys (reference bindings): W/A/S/D fly, R/F up/down (Shift/Ctrl in the
reference), arrow keys look (mouse drag in the reference), +/- exposure.

Usage: python -m tpurt.cli view scene.gltf --res 480x360 --port 8000
"""

from __future__ import annotations

import io
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>tpurt viewer</title><style>
body { background: #111; color: #ccc; font-family: monospace; text-align: center; }
img { image-rendering: pixelated; width: 80vmin; }
</style></head>
<body>
<h3>tpurt progressive viewer</h3>
<div>WASD fly &middot; R/F up/down &middot; arrows or drag look &middot; +/- exposure</div>
<p id="status"></p>
<img id="frame" src="/frame.png" draggable="false">
<script>
const img = document.getElementById('frame');
const status = document.getElementById('status');
setInterval(() => { img.src = '/frame.png?' + Date.now();
  fetch('/status').then(r => r.text()).then(t => status.textContent = t);
}, 500);
document.addEventListener('keydown', (e) => {
  fetch('/key?k=' + encodeURIComponent(e.key));
});
// drag-to-look, gated on the left button like the reference
// (Window.cpp:67-82): deltas accumulate and flush every 60 ms
let dragging = false, accX = 0, accY = 0;
img.addEventListener('pointerdown', (e) => {
  if (e.button === 0) { dragging = true; img.setPointerCapture(e.pointerId); }
});
img.addEventListener('pointerup', () => { dragging = false; });
img.addEventListener('pointermove', (e) => {
  if (dragging) { accX += e.movementX; accY += e.movementY; }
});
setInterval(() => {
  if (accX !== 0 || accY !== 0) {
    fetch('/look?dx=' + accX + '&dy=' + accY); accX = 0; accY = 0;
  }
}, 60);
</script>
</body></html>"""


class ViewerState:
    def __init__(self, renderer):
        self.renderer = renderer
        self.lock = threading.Lock()
        self.running = True
        # camera generation: bumped on every camera change so the render
        # loop can detect a mid-step move and discard the stale launch
        self.gen = 0
        # viewer-local exposure (changing RenderConfig would recompile the
        # render step; tonemap happens host-side anyway)
        self.exposure = float(renderer.config.exposure)
        # mouse-look angles (Raytracer.hpp:34-35 defaults)
        self.phi = 0.0
        self.theta = math.pi
        self._sync_angles_from_camera()

    def _sync_angles_from_camera(self):
        d = np.asarray(self.renderer.camera.direction)
        self.theta = math.asin(float(np.clip(d[1], -1.0, 1.0)))
        self.phi = math.atan2(float(d[0]), float(d[2]))

    def handle_key(self, key: str):
        from tpurt.camera import Camera

        step = 0.25  # fly step (the reference moves 2 units/s)
        look = 0.08
        with self.lock:
            r = self.renderer
            cam = r.camera
            if key in ("w", "W"):
                cam = cam.moved(forward=step)
            elif key in ("s", "S"):
                cam = cam.moved(forward=-step)
            elif key in ("a", "A"):
                cam = cam.moved(rightward=-step)
            elif key in ("d", "D"):
                cam = cam.moved(rightward=step)
            elif key in ("r", "R"):
                cam = cam.moved(upward=step)
            elif key in ("f", "F"):
                cam = cam.moved(upward=-step)
            elif key in ("ArrowLeft", "ArrowRight", "ArrowUp", "ArrowDown"):
                if key == "ArrowLeft":
                    self.phi += look
                elif key == "ArrowRight":
                    self.phi -= look
                elif key == "ArrowUp":
                    self.theta += look
                else:
                    self.theta -= look
                self.theta = max(-1.55, min(1.55, self.theta))
                cam = Camera.from_angles(np.asarray(cam.position), self.phi,
                                         self.theta)
            elif key in ("+", "="):
                self.exposure += 0.25
                return
            elif key in ("-", "_"):
                self.exposure = max(0.0, self.exposure - 0.25)
                return
            else:
                return
            r.set_camera(cam)  # resets accumulation (reference semantics)
            self.gen += 1

    def handle_look(self, dx: float, dy: float):
        """Mouse-drag look: pixel deltas -> yaw/pitch, matching the arrow
        keys' angle convention (the reference's LMB-gated mouse deltas,
        Window.cpp:67-82 -> Raytracer.cpp camera update)."""
        from tpurt.camera import Camera

        sens = 0.005  # radians per pixel
        with self.lock:
            r = self.renderer
            self.phi -= dx * sens         # drag right -> look right
            self.theta -= dy * sens       # drag up (dy<0) -> look up
            self.theta = max(-1.55, min(1.55, self.theta))
            cam = Camera.from_angles(np.asarray(r.camera.position), self.phi,
                                     self.theta)
            r.set_camera(cam)  # resets accumulation (reference semantics)
            self.gen += 1

    def frame_png(self) -> bytes:
        from PIL import Image

        from tpurt import film

        # no lock: jnp arrays are immutable, so snapshotting the accum
        # REFERENCE is atomic (GIL) and tonemapping it race-free — frame
        # requests never stall behind a device launch in the render loop
        accum = self.renderer.accum
        mapped = film.to_srgb8(
            np.asarray(film.tonemap(accum, self.exposure))
        )[..., :3]
        buf = io.BytesIO()
        Image.fromarray(mapped, "RGB").save(buf, format="PNG")
        return buf.getvalue()

    def status(self) -> str:
        r = self.renderer
        return (f"{r.sample_count}/{r.config.max_samples} spp | "
                f"{r.sample_time:.1f}s | exposure {self.exposure:.2f}")

    def render_loop(self):
        while self.running:
            with self.lock:
                gen0 = self.gen
                busy = self.renderer.sample_count < self.renderer.config.max_samples
            if busy:
                # device compute runs OUTSIDE the lock so /frame.png and key
                # handling stay responsive during multi-second launches
                self.renderer.step()
                with self.lock:
                    if self.gen != gen0:
                        # camera moved mid-step: the launch used the old
                        # camera — discard it (reference reset semantics)
                        self.renderer.reset()
            else:
                time.sleep(0.1)


def serve(renderer, host: str = "127.0.0.1", port: int = 8000,
          block: bool = True):
    """Serve the progressive viewer. With `block` (the CLI path) this
    blocks until Ctrl-C. With block=False it returns (server, state,
    stop): callers (tests) MUST call stop() — the render worker keeps
    driving the jax backend otherwise, and a leaked worker stepping
    concurrently with later device work has segfaulted the interpreter
    (observed under the full pytest run, round 4)."""
    state = ViewerState(renderer)
    worker = threading.Thread(target=state.render_loop, daemon=True)
    worker.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif url.path == "/frame.png":
                self._send(200, state.frame_png(), "image/png")
            elif url.path == "/status":
                self._send(200, state.status().encode(), "text/plain")
            elif url.path == "/key":
                key = parse_qs(url.query).get("k", [""])[0]
                state.handle_key(key)
                self._send(200, b"ok", "text/plain")
            elif url.path == "/look":
                q = parse_qs(url.query)
                try:
                    dx = float(q.get("dx", ["0"])[0])
                    dy = float(q.get("dy", ["0"])[0])
                except ValueError:
                    dx = dy = 0.0
                state.handle_look(dx, dy)
                self._send(200, b"ok", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

    server = ThreadingHTTPServer((host, port), Handler)
    if not block:
        http_thread = threading.Thread(target=server.serve_forever,
                                       daemon=True)
        http_thread.start()

        def stop():
            state.running = False
            worker.join(timeout=60)
            server.shutdown()
            http_thread.join(timeout=10)
            server.server_close()

        return server, state, stop
    print(f"tpurt viewer at http://{host}:{port}/ (Ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state.running = False
        worker.join(timeout=60)
        server.server_close()
