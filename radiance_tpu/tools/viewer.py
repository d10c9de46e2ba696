"""Progressive render viewer: the interactive-loop analog.

Equivalent of the reference's inspector (reference:
visualization/inspector.{h,cpp}): a render loop that calls a user
callback each frame and displays/persists the returned RGBA8 image.
This environment is headless, so "display" means writing a PNG each
refresh (plus an optional terminal half-block preview); the callback
contract matches renderLoop's (inspector.h:6-8).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional

import numpy as np


def _terminal_preview(image: np.ndarray, max_cols: int = 64) -> str:
    """Render the image as ANSI half-block characters."""
    h, w = image.shape[:2]
    cols = min(max_cols, w)
    rows = max(2, int(cols * h / w / 1.0)) & ~1
    ys = (np.linspace(0, h - 1, rows)).astype(int)
    xs = (np.linspace(0, w - 1, cols)).astype(int)
    small = image[np.ix_(ys, xs)][..., :3]
    lines = []
    for r in range(0, rows - 1, 2):
        line = []
        for c in range(cols):
            top = small[r, c]
            bot = small[r + 1, c]
            line.append(f"\x1b[38;2;{top[0]};{top[1]};{top[2]}m"
                        f"\x1b[48;2;{bot[0]};{bot[1]};{bot[2]}m▀")
        lines.append("".join(line) + "\x1b[0m")
    return "\n".join(lines)


def render_loop(callback: Callable, data=None, *, frames: int = 0,
                out_path: str = "viewer_output.png",
                preview: bool = True,
                save_every: int = 1) -> Optional[np.ndarray]:
    """Run the progressive render loop (reference: renderLoop,
    inspector.cpp:71-283).

    callback(data) -> np.ndarray [H, W, 4] u8 (the reference's callback
    fills image/width/height out-params; returning the array is the
    Python shape of the same contract).
    frames: 0 = loop until Ctrl-C.
    """
    from radiance_tpu.utils import image as image_io

    image = None
    frame = 0
    try:
        while frames == 0 or frame < frames:
            t0 = time.time()
            image = np.asarray(callback(data))
            dt = time.time() - t0
            if frame % save_every == 0:
                image_io.write_image(out_path, image)
            if preview and sys.stdout.isatty():
                sys.stdout.write("\x1b[2J\x1b[H")
                sys.stdout.write(_terminal_preview(image) + "\n")
            print(f"frame {frame}: {dt:.3f}s -> {out_path}")
            frame += 1
    except KeyboardInterrupt:
        print("\nviewer stopped.")
    if image is not None:
        # "Save" button analog: timestamped copy (inspector.cpp:234-243)
        final = image_io.timestamped_path("output", "png")
        image_io.write_image(final, image)
        print(f"saved {final}")
    return image
