"""Image IO: PNG/JPG write + RMSE (the golden-image test metric).

Replaces the reference's stb_image_write usage (reference:
samples/sample1.cpp:437-439 writes timestamped JPGs).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def write_image(path: str, rgba: np.ndarray) -> str:
    """Write an [H, W, 3|4] uint8 image; format from extension."""
    from PIL import Image as PILImage

    arr = np.asarray(rgba, np.uint8)
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    img = PILImage.fromarray(arr, mode)
    if path.lower().endswith((".jpg", ".jpeg")):
        img = img.convert("RGB")
    img.save(path)
    return path


def read_image(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    return np.asarray(PILImage.open(path).convert("RGBA"))


def timestamped_path(prefix: str = "output", ext: str = "png") -> str:
    """Like the reference's `output.<ctime>.jpg` naming (sample1.cpp:433)."""
    return f"{prefix}.{int(time.time())}.{ext}"


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error between images in 0..255 space."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
