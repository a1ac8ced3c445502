"""ctypes bindings for the native host runtime (native/otslam_native.cpp).

The shared library builds on demand with g++ (cached next to the source);
every entry point has a NumPy fallback so the package works without a
toolchain. The FrameRing is the sensor->device frame queue: a C++ SPSC ring
with drop-oldest semantics (depth-1-QoS behavior) whose buffers the capture
thread fills without holding the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "otslam_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libotslam_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native():
    """The loaded CDLL, building if needed; None when unavailable."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_size.restype = ctypes.c_int64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_dropped.restype = ctypes.c_int64
        lib.ring_dropped.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_double]
        lib.ring_pop.restype = ctypes.c_int
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double)]
        lib.ring_pop_latest.restype = ctypes.c_int
        lib.ring_pop_latest.argtypes = lib.ring_pop.argtypes
        lib.depth_u16_to_m.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_float]
        lib.depth_m_to_u16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_float,
                                       ctypes.c_float]
        lib.depth_filter.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_float]
        lib.write_ply_points.restype = ctypes.c_int64
        lib.write_ply_points.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                         ctypes.c_void_p, ctypes.c_int64]
        lib.write_pgm.restype = ctypes.c_int64
        lib.write_pgm.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


class FrameRing:
    """SPSC RGB-D frame queue. Frames are (depth f32 (H,W), color u8 (H,W,3))
    packed into one contiguous slab per slot."""

    def __init__(self, height: int, width: int, capacity: int = 8):
        self.height, self.width = height, width
        self.depth_bytes = height * width * 4
        self.color_bytes = height * width * 3
        self.frame_bytes = self.depth_bytes + self.color_bytes
        self._lib = load_native()
        self._scratch = np.empty(self.frame_bytes, np.uint8)
        if self._lib is not None:
            self._ring = self._lib.ring_create(capacity, self.frame_bytes)
        else:  # pure-python fallback (deque-like)
            from collections import deque
            self._ring = None
            self._q: "deque" = deque(maxlen=capacity)
            self._dropped = 0
            self._cap = capacity

    def push(self, depth_m: np.ndarray, color_rgb: np.ndarray,
             stamp: float = 0.0) -> None:
        d = np.ascontiguousarray(depth_m, np.float32)
        c = np.ascontiguousarray(color_rgb, np.uint8)
        if self._ring is not None:
            buf = self._scratch
            buf[:self.depth_bytes] = d.view(np.uint8).reshape(-1)
            buf[self.depth_bytes:] = c.reshape(-1)
            self._lib.ring_push(self._ring,
                                buf.ctypes.data_as(ctypes.c_void_p),
                                float(stamp))
        else:
            if len(self._q) == self._cap:
                self._dropped += 1
            self._q.append((d.copy(), c.copy(), float(stamp)))

    def _unpack(self, buf) -> Tuple[np.ndarray, np.ndarray]:
        d = buf[:self.depth_bytes].view(np.float32).reshape(
            self.height, self.width)
        c = buf[self.depth_bytes:].reshape(self.height, self.width, 3)
        return d.copy(), c.copy()

    def _pop_impl(self, fn) -> Optional[Tuple[np.ndarray, np.ndarray, float]]:
        buf = np.empty(self.frame_bytes, np.uint8)
        stamp = ctypes.c_double(0.0)
        ok = fn(self._ring, buf.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(stamp))
        if not ok:
            return None
        d, c = self._unpack(buf)
        return d, c, stamp.value

    def pop(self):
        if self._ring is not None:
            return self._pop_impl(self._lib.ring_pop)
        return self._q.popleft() if self._q else None

    def pop_latest(self):
        """Flush the queue and return the freshest frame (scanner semantics)."""
        if self._ring is not None:
            return self._pop_impl(self._lib.ring_pop_latest)
        if not self._q:
            return None
        item = self._q[-1]
        self._q.clear()
        return item

    def __len__(self) -> int:
        if self._ring is not None:
            return int(self._lib.ring_size(self._ring))
        return len(self._q)

    @property
    def dropped(self) -> int:
        if self._ring is not None:
            return int(self._lib.ring_dropped(self._ring))
        return self._dropped

    def __del__(self):
        if getattr(self, "_ring", None) is not None and self._lib is not None:
            self._lib.ring_destroy(self._ring)
            self._ring = None


def depth_u16_to_m(raw: np.ndarray, depth_scale: float = 1000.0) -> np.ndarray:
    lib = load_native()
    raw = np.ascontiguousarray(raw, np.uint16)
    if lib is None:
        return raw.astype(np.float32) / depth_scale
    out = np.empty(raw.shape, np.float32)
    lib.depth_u16_to_m(raw.ctypes.data_as(ctypes.c_void_p),
                       out.ctypes.data_as(ctypes.c_void_p),
                       raw.size, float(depth_scale))
    return out


def depth_m_to_u16(depth: np.ndarray, depth_scale: float = 1000.0,
                   depth_max: float = 5.0) -> np.ndarray:
    lib = load_native()
    d = np.ascontiguousarray(depth, np.float32)
    if lib is None:
        d2 = d.copy()
        d2[~np.isfinite(d2)] = 0.0
        d2[(d2 > depth_max) | (d2 < 0)] = 0.0
        return np.round(d2 * depth_scale).astype(np.uint16)
    out = np.empty(d.shape, np.uint16)
    lib.depth_m_to_u16(d.ctypes.data_as(ctypes.c_void_p),
                       out.ctypes.data_as(ctypes.c_void_p),
                       d.size, float(depth_scale), float(depth_max))
    return out


def write_ply_points_native(path: str, points: np.ndarray,
                            colors: Optional[np.ndarray] = None) -> bool:
    """Fast binary PLY write through the native codec; False on fallback."""
    lib = load_native()
    if lib is None:
        return False
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    rgb = None
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = np.clip(c * 255.0, 0, 255).astype(np.uint8)
        rgb = np.ascontiguousarray(c.reshape(-1, 3))
    n = lib.write_ply_points(
        path.encode(), pts.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p) if rgb is not None else None,
        len(pts))
    return n == len(pts)
