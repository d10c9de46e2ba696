"""Interactive viewer control channel (reference: sample1.cpp:479-548)."""

import json
import os

import numpy as np

from radiance_tpu.tools import viewer


def test_parse_line():
    assert viewer.ControlChannel.parse_line("camera.x 1.5") == {
        "camera.x": 1.5}
    assert viewer.ControlChannel.parse_line("light.dir 0.3 -1 -0.4") == {
        "light.dir": [0.3, -1.0, -0.4]}
    assert viewer.ControlChannel.parse_line("debug 7") == {"debug": 7.0}
    assert viewer.ControlChannel.parse_line("save") == {"_save": True}
    assert viewer.ControlChannel.parse_line("quit") == {"_quit": True}
    assert viewer.ControlChannel.parse_line("") == {}
    assert viewer.ControlChannel.parse_line("camera.x") == {}


def test_watch_file_fires_once_per_change(tmp_path):
    path = str(tmp_path / "controls.json")
    ch = viewer.ControlChannel(use_stdin=False, watch_file=path)
    assert ch.poll() == {}  # missing file: no updates

    with open(path, "w") as f:
        json.dump({"camera.x": 2.0, "debug": 3}, f)
    up = ch.poll()
    assert up == {"camera.x": 2.0, "debug": 3}
    assert ch.poll() == {}  # unchanged mtime: no re-fire

    os.utime(path, ns=(1, 1))  # touch with a different mtime
    assert ch.poll() == {"camera.x": 2.0, "debug": 3}


def test_render_loop_applies_controls_and_resets(tmp_path):
    """A camera edit must reach on_change before the next frame renders
    (the reset-on-change contract, sample1.cpp:482)."""
    path = str(tmp_path / "controls.json")
    with open(path, "w") as f:
        json.dump({"camera.x": 5.0}, f)

    state = {"camera_x": 0.0, "total_samples": 10, "frames": 0}

    def on_change(updates):
        if "camera.x" in updates:
            state["camera_x"] = updates["camera.x"]
        state["total_samples"] = 0

    def callback(_):
        state["frames"] += 1
        state["total_samples"] += 1
        return np.zeros((4, 4, 4), np.uint8)

    viewer.render_loop(
        callback, None, frames=2, preview=False,
        out_path=str(tmp_path / "out.png"),
        controls=viewer.ControlChannel(use_stdin=False, watch_file=path),
        on_change=on_change)

    assert state["frames"] == 2
    assert state["camera_x"] == 5.0
    # reset happened before frame 1, then 2 frames accumulated
    assert state["total_samples"] == 2
