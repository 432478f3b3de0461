"""Live HTTP viewer — the runtime analog of the reference's window/event
loop (glfw.zig:58-104: ``Window``, ``shouldClose``, ``pollEvents``).

There is no display in a TPU-pod environment, so "present" egresses over
HTTP instead of WSI: an MJPEG stream (multipart/x-mixed-replace) any
browser or ``ffplay`` can show live, plus a single-frame endpoint and a
minimal input channel that feeds ``poll_events``/``should_close`` — the
same three capabilities the reference's glfw binding exposes.

Endpoints:

* ``/``        — HTML page: <img> bound to the stream + key forwarding JS
* ``/stream``  — MJPEG: one JPEG part per presented frame
* ``/frame``   — latest frame as a single JPEG
* ``/input?key=K&action=down|up`` — key state (pollEvents analog)
* ``/close``   — request shutdown (window-close analog)

Typical loop (mirrors basic_planes.zig:316-350)::

    viewer = LiveViewer(port=8089)
    while not viewer.should_close:
        fb = frame_program(fb, uniforms)
        host = sc.present(fb)             # swapchain ring (u8 RGBA)
        if host is not None:
            viewer.present(host)
        keys = viewer.poll_events()
    viewer.stop()
"""

from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..utils.logging import scoped

_log = scoped("viewer")

_INDEX_HTML = b"""<!doctype html><html><head><title>ray_eater_tpu</title>
<style>body{margin:0;background:#111;display:flex;justify-content:center}
img{image-rendering:pixelated;max-width:100vw;max-height:100vh}</style>
</head><body><img src="/stream">
<script>
const send=(k,a)=>fetch(`/input?key=${encodeURIComponent(k)}&action=${a}`);
window.addEventListener('keydown',e=>send(e.key,'down'));
window.addEventListener('keyup',e=>send(e.key,'up'));
window.addEventListener('beforeunload',()=>fetch('/close'));
</script></body></html>"""

_BOUNDARY = b"rayeaterframe"


def encode_jpeg(frame: np.ndarray, quality: int = 85) -> bytes:
    """u8 RGB(A) array → JPEG bytes (PIL; alpha dropped)."""
    from PIL import Image
    arr = np.asarray(frame)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., :3]
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


class LiveViewer:
    """Threaded MJPEG present target + event source.

    ``present`` is non-blocking: it swaps in the latest frame and wakes
    any connected stream clients (mailbox semantics — slow clients skip
    frames rather than backpressure the render loop, matching the
    swapchain ring's mailbox present mode, swapchain.zig:155-158).
    """

    def __init__(self, port: int = 8089, host: str = "0.0.0.0",
                 quality: int = 85):
        self._lock = threading.Condition()
        self._frame: bytes | None = None
        self._seq = 0
        self._keys: dict[str, bool] = {}
        self._should_close = False
        self.quality = quality
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):   # quiet access log
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _INDEX_HTML
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif url.path == "/frame":
                    body = viewer._wait_frame(None)
                    if body is None:
                        self.send_response(503)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif url.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary="
                        + _BOUNDARY.decode())
                    self.end_headers()
                    last = -1
                    try:
                        while not viewer._should_close:
                            got = viewer._wait_frame(last, timeout=1.0)
                            if got is None:
                                continue
                            body, last = got, viewer._seq
                            self.wfile.write(
                                b"--" + _BOUNDARY + b"\r\n"
                                b"Content-Type: image/jpeg\r\n"
                                b"Content-Length: "
                                + str(len(body)).encode() + b"\r\n\r\n"
                                + body + b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                elif url.path == "/input":
                    q = parse_qs(url.query)
                    key = q.get("key", [""])[0]
                    down = q.get("action", ["down"])[0] == "down"
                    if key:
                        with viewer._lock:
                            viewer._keys[key] = down
                        if key == "Escape" and down:
                            viewer._should_close = True
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                elif url.path == "/close":
                    viewer._should_close = True
                    with viewer._lock:
                        viewer._lock.notify_all()
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                else:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        _log.info("live viewer at http://%s:%d/", host, self.port)

    # -- present side -----------------------------------------------------
    def present(self, frame: np.ndarray) -> None:
        """Encode + publish the latest frame (u8 RGB/RGBA, HxWxC)."""
        body = encode_jpeg(frame, self.quality)
        with self._lock:
            self._frame = body
            self._seq += 1
            self._lock.notify_all()

    def _wait_frame(self, newer_than, timeout: float | None = None):
        with self._lock:
            if newer_than is None:
                return self._frame
            if self._seq == newer_than:
                self._lock.wait(timeout)
            if self._seq == newer_than:
                return None
            return self._frame

    # -- event side (glfw.pollEvents / shouldClose analogs) ---------------
    @property
    def should_close(self) -> bool:
        return self._should_close

    def poll_events(self) -> dict[str, bool]:
        """Snapshot of currently-down keys (glfw.zig pollEvents analog)."""
        with self._lock:
            return dict(self._keys)

    def request_close(self) -> None:
        self._should_close = True
        with self._lock:
            self._lock.notify_all()

    def stop(self) -> None:
        self.request_close()
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
