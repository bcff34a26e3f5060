"""Native host runtime: C++ data-loader core with ctypes bindings.

The reference's host pipeline rides torch's C++ DataLoader; this package
is our equivalent — the hot per-item numeric loops compiled to native code
(`ray_sampler.cpp`), built on demand with g++ and bound via ctypes (no
pybind11 in this environment).  Callers fall back to the numpy reference
implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ray_sampler.cpp")
_LIB_PATH = os.path.join(_DIR, "libray_sampler.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            print(f"[native] build failed: {r.stderr[:500]}")
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[native] build unavailable: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.build_rays.restype = ctypes.c_int
        lib.build_rays.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ]
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def build_rays_native(H: int, W: int, K: np.ndarray, R: np.ndarray,
                      T: np.ndarray, bbox_min: np.ndarray,
                      bbox_max: np.ndarray
                      ) -> Optional[Tuple[np.ndarray, ...]]:
    """Fused ray generation + bbox intersection; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    rays_o = np.empty((H * W, 3), np.float32)
    rays_d = np.empty((H * W, 3), np.float32)
    near = np.empty(H * W, np.float32)
    far = np.empty(H * W, np.float32)
    mask = np.empty(H * W, np.uint8)
    bbox = np.ascontiguousarray(
        np.concatenate([bbox_min, bbox_max]).astype(np.float64))
    rc = lib.build_rays(
        H, W,
        np.ascontiguousarray(K, np.float64).reshape(9),
        np.ascontiguousarray(R, np.float64).reshape(9),
        np.ascontiguousarray(T, np.float64).reshape(3),
        bbox, rays_o.reshape(-1), rays_d.reshape(-1), near, far, mask)
    if rc != 0:
        return None
    return rays_o, rays_d, near, far, mask.astype(bool)
