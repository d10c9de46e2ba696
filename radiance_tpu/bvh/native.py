"""ctypes bindings for the native C++ BVH builder (native/bvh_builder.cpp).

The shared library is compiled lazily on first use (g++ is part of the
toolchain); the NumPy builder is the always-available fallback and the
semantic oracle -- both emit bit-identical trees (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from radiance_tpu.core import types

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libradiance_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) <
                os.path.getmtime(os.path.join(_NATIVE_DIR, "bvh_builder.cpp"))):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:  # g++ missing or compile error
                print(f"[radiance_tpu] native builder unavailable "
                      f"({type(e).__name__}); using NumPy builder")
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"[radiance_tpu] failed to load native builder: {e}")
            _build_failed = True
            return None
        lib.rt_build_bvh.restype = ctypes.c_int64
        lib.rt_build_bvh.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.rt_compute_escape.restype = None
        lib.rt_compute_escape.argtypes = [ctypes.c_void_p] * 4 + [
            ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh(bmin: np.ndarray, bmax: np.ndarray,
              leaf_type: int) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Native build; returns (nodes, order, max_depth) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = len(bmin)
    nodes = np.zeros(max(2 * n + 1, 1), dtype=types.DEVICE_BVH_NODE_DTYPE)
    order = np.zeros(max(n, 1), dtype=np.int64)
    depth = ctypes.c_int32(0)
    count = lib.rt_build_bvh(
        bmin.ctypes.data_as(ctypes.c_void_p),
        bmax.ctypes.data_as(ctypes.c_void_p),
        n, leaf_type,
        nodes.ctypes.data_as(ctypes.c_void_p), len(nodes),
        order.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(depth))
    if count < 0:
        return None
    return nodes[:count].copy(), order[:n].copy(), int(depth.value)


def compute_escape(a: np.ndarray, b: np.ndarray, kind: np.ndarray,
                   root: int, esc: np.ndarray) -> bool:
    """Fill esc in place for the tree rooted at `root`; False if no native."""
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    kind = np.ascontiguousarray(kind, np.int32)
    assert esc.dtype == np.int32 and esc.flags.c_contiguous
    lib.rt_compute_escape(
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p),
        kind.ctypes.data_as(ctypes.c_void_p),
        esc.ctypes.data_as(ctypes.c_void_p),
        len(a), root)
    return True
