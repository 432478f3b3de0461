"""Live HTTP viewer: frame egress, MJPEG stream, and the event-loop
analog (pollEvents/shouldClose, glfw.zig:58-104)."""

import urllib.request

import numpy as np

from ray_eater_tpu.io.viewer import LiveViewer, encode_jpeg


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def test_encode_jpeg_rgba():
    frame = np.zeros((16, 32, 4), np.uint8)
    frame[..., 0] = 200
    data = encode_jpeg(frame)
    assert data[:2] == b"\xff\xd8"        # JPEG SOI marker


def test_frame_and_events_roundtrip():
    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        status, _ = _get(v.port, "/")
        assert status == 200

        frame = np.random.randint(0, 255, (24, 48, 3), np.uint8)
        v.present(frame)
        status, body = _get(v.port, "/frame")
        assert status == 200 and body[:2] == b"\xff\xd8"

        _get(v.port, "/input?key=w&action=down")
        assert v.poll_events().get("w") is True
        _get(v.port, "/input?key=w&action=up")
        assert v.poll_events().get("w") is False

        assert not v.should_close
        _get(v.port, "/close")
        assert v.should_close
    finally:
        v.stop()


def test_stream_yields_parts():
    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        v.present(np.zeros((8, 16, 3), np.uint8))
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/stream", timeout=5)
        head = req.read(64)
        assert b"--rayeaterframe" in head
        req.close()
    finally:
        v.stop()
