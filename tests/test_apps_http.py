"""HTTP smoke tests for the serving surfaces: the splat viewer serves
the page and renders frames over HTTP with the ms/FPS instrumentation
header (parity with the reference viewer's frame timer, gui.py:100-104)."""

import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def viewer_server():
    from lgm_tpu.apps.viewer import ViewerState, _make_handler

    rng = np.random.default_rng(2)
    g = np.zeros((256, 14), np.float32)
    g[:, 0:3] = rng.normal(0, 0.3, (256, 3))
    g[:, 3] = 0.9
    g[:, 4:7] = 0.05
    g[:, 7] = 1.0
    g[:, 11:14] = rng.uniform(0, 1, (256, 3))
    state = ViewerState(g, size=64)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_viewer_serves_page(viewer_server):
    with urllib.request.urlopen(viewer_server + "/") as r:
        body = r.read().decode()
    assert r.status == 200
    assert "lgm_tpu viewer" in body and "X-Render-Ms" in body


def test_viewer_renders_frame_with_timing(viewer_server):
    url = viewer_server + "/render?el=10&az=30&radius=1.5&fovy=49.1&scale=1"
    with urllib.request.urlopen(url) as r:
        data = r.read()
    assert r.status == 200
    assert r.headers["Content-Type"] == "image/jpeg"
    assert float(r.headers["X-Render-Ms"]) > 0  # the gui.py:100-104 parity
    assert data[:2] == b"\xff\xd8"  # JPEG magic
    # Alpha and depth modes render too, and a different pose gives
    # different bytes.
    with urllib.request.urlopen(url + "&mode=alpha") as r2:
        alpha = r2.read()
    assert alpha[:2] == b"\xff\xd8"
    with urllib.request.urlopen(url + "&mode=depth") as rd:
        depth = rd.read()
    assert depth[:2] == b"\xff\xd8"
    with urllib.request.urlopen(
        viewer_server + "/render?el=-30&az=200&radius=2.0"
    ) as r3:
        other = r3.read()
    assert other != data


def test_viewer_404(viewer_server):
    try:
        urllib.request.urlopen(viewer_server + "/nope")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised


@pytest.fixture(scope="module")
def app_server():
    from lgm_tpu.apps.app import AppState, _make_stdlib_handler
    from lgm_tpu.config import get_config

    opt = get_config("nano").replace(num_input_views=4)
    state = AppState(opt, resume=None, diffusion_ckpt=None)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                _make_stdlib_handler(state))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_app_serves_form(app_server):
    with urllib.request.urlopen(app_server + "/") as r:
        body = r.read().decode()
    assert r.status == 200 and "form" in body


def test_app_mv_upload_roundtrip(app_server):
    """POST 4 views -> LGM forward -> ply + orbit video land in /files/."""
    import cv2

    rng = np.random.default_rng(4)
    parts = []
    boundary = "xXbOuNdArYxX"
    for i in range(4):
        img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="v{i}"; filename="v{i}.png"\r\n'
            f"Content-Type: image/png\r\n\r\n".encode()
            + buf.tobytes() + b"\r\n"
        )
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        app_server + "/", data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        out = r.read().decode()
    assert "done" in out and ".ply" in out

    with urllib.request.urlopen(app_server + "/files/") as r:
        listing = r.read().decode()
    assert "upload.ply" in listing and "upload.mp4" in listing
    with urllib.request.urlopen(app_server + "/files/upload.ply") as r:
        ply = r.read()
    assert ply.startswith(b"ply")
