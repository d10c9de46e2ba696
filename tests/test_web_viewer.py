"""Browser-served viewer (reference: visualization/inspector.cpp:71-246
-- live frame + ImGui controls + Save; here an HTTP page with the same
capability, radiance_tpu/tools/web_viewer.py)."""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from radiance_tpu.tools import web_viewer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, dict(r.headers), r.read()


def _post(url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else b""
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


def test_web_viewer_end_to_end(tmp_path):
    """Full loop: frames served as PNG, control edits reach on_change
    before the next frame (the reset-on-change contract,
    sample1.cpp:479-490), Save writes a timestamped PNG, /quit stops
    the loop."""
    seen = []
    state = {"v": 64}
    addr_box = {}
    ready = threading.Event()

    def on_change(updates):
        seen.append(dict(updates))
        if "camera.x" in updates:
            state["v"] = int(updates["camera.x"])

    def frame(_):
        # deterministic content that tracks the control value
        img = np.full((8, 8, 4), state["v"], np.uint8)
        img[..., 3] = 255
        return img

    def on_start(addr):
        addr_box["addr"] = addr
        ready.set()

    out = str(tmp_path / "web.png")
    t = threading.Thread(
        target=web_viewer.render_loop_web,
        kwargs=dict(callback=frame, frames=0, out_path=out,
                    on_change=on_change, on_start=on_start,
                    controls={"camera.x": 64.0}),
        daemon=True)
    t.start()
    assert ready.wait(10)
    host, port = addr_box["addr"]
    base = f"http://{host}:{port}"

    # page + state + frame surfaces
    st, _, body = _get(base + "/")
    assert st == 200 and b"radiance_tpu inspector" in body
    png = b""
    for _ in range(200):
        try:
            st, hdrs, png = _get(base + "/frame.png")
        except urllib.error.HTTPError:  # 503 before the first frame
            st, png = 503, b""
        if st == 200 and png:
            break
        time.sleep(0.02)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    arr = np.asarray(Image.open(io.BytesIO(png)))
    assert arr.shape == (8, 8, 4) and arr[0, 0, 0] == 64

    st, body = _post(base + "/control", {"camera.x": 200})
    assert st == 200
    # wait for a frame rendered AFTER the edit landed
    for _ in range(200):
        st, hdrs, png = _get(base + "/frame.png")
        arr = np.asarray(Image.open(io.BytesIO(png)))
        if arr[0, 0, 0] == 200:
            break
        time.sleep(0.02)
    assert arr[0, 0, 0] == 200
    assert any("camera.x" in u for u in seen)

    # state echoes the edited control back to the page
    st, _, body = _get(base + "/state")
    s = json.loads(body)
    assert s["controls"]["camera.x"] == 200
    assert s["frame"] > 0

    # Save button analog -> a timestamped PNG next to out_path
    n0 = len(os.listdir(tmp_path))
    _post(base + "/save")
    for _ in range(200):
        if len(os.listdir(tmp_path)) > n0:
            break
        time.sleep(0.02)
    assert len(os.listdir(tmp_path)) > n0

    _post(base + "/quit")
    t.join(10)
    assert not t.is_alive()
    assert os.path.exists(out)  # final frame persisted


def test_control_rejects_bad_json(tmp_path):
    viewer = web_viewer.WebViewer()
    host, port = viewer.serve()
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/control", data=b"not json",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        viewer.shutdown()
