"""ctypes bindings for the native C++ dataset loader (native/data_loader.cpp).

Role parity: the reference's dataset IO is native C++ (`src/tum_rgbd/io.h`,
cv::imread inside `qsp_slam_rgbd.cc:329-361`).  Here a worker pool decodes
PNG frames AHEAD of the consumer so file IO + decompression overlap the
tracker's device work — the single-controller loop never waits on disk.

Every entry point degrades gracefully: if the shared library cannot be
built or a PNG uses an unsupported feature (palette, Adam7), callers fall
back to the PIL path and produce bit-identical arrays (the native decoder
replicates PIL's integer luminance formula).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        lib_path = os.path.join(_NATIVE_DIR, "libqsp_native.so")
        need_build = not os.path.exists(lib_path)
        if not need_build:
            # Rebuild if sources are newer (the lib also carries
            # marching_cubes; either source may have changed).
            srcs = [
                os.path.join(_NATIVE_DIR, f)
                for f in ("data_loader.cpp", "marching_cubes.cpp")
            ]
            mt = os.path.getmtime(lib_path)
            need_build = any(
                os.path.exists(s) and os.path.getmtime(s) > mt for s in srcs
            )
        if need_build:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(lib_path)
        if not hasattr(lib, "ql_load_png"):
            raise OSError("stale libqsp_native.so without loader symbols")
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        lib.ql_load_png.restype = ctypes.c_int
        lib.ql_load_png.argtypes = [
            ctypes.c_char_p, ctypes.c_float, c_float_p, ctypes.c_int,
            c_int_p, c_int_p,
        ]
        lib.ql_pool_create.restype = ctypes.c_void_p
        lib.ql_pool_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.ql_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.ql_pool_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_float,
        ]
        lib.ql_pool_wait.restype = ctypes.c_int
        lib.ql_pool_wait.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, c_float_p, c_float_p,
            c_int_p, c_int_p, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    if os.environ.get("QSP_NATIVE_LOADER", "1") == "0":
        return False
    return _load_native() is not None


MAX_PIXELS = 2048 * 1536  # covers TUM 640x480 and KITTI 1242x376 amply

_tls = threading.local()


def load_png(path: str, scale: float = 1.0) -> Optional[np.ndarray]:
    """Decode a PNG to float32 (grayscale; RGB converts by PIL's formula).

    Returns None when the native path is unavailable or the file uses an
    unsupported PNG feature — callers fall back to PIL.
    """
    lib = _load_native() if native_available() else None
    if lib is None:
        return None
    # Thread-local reusable scratch (ctypes releases the GIL mid-call, so a
    # module-global buffer would race across threads).
    buf = getattr(_tls, "scratch", None)
    if buf is None:
        buf = _tls.scratch = np.empty(MAX_PIXELS, np.float32)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.ql_load_png(
        path.encode(), ctypes.c_float(scale),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), MAX_PIXELS,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class FramePrefetcher:
    """Threaded (gray, depth) frame prefetcher over the native pool.

    Submits up to `lookahead` frames ahead of the consumer; `get(idx)`
    blocks only if that frame's decode hasn't finished yet.  Returns None
    on native-decode failure (caller falls back to PIL for that frame).
    """

    def __init__(
        self,
        pairs: list[tuple[str, str]],  # (rgb_path, depth_path) absolute
        depth_scale: float,
        threads: int = 2,
        lookahead: int = 4,
    ):
        self._lib = _load_native() if native_available() else None
        self.pairs = pairs
        self.depth_scale = depth_scale
        self.lookahead = lookahead
        self._submitted = 0
        self._pool = None
        if self._lib is not None:
            self._pool = self._lib.ql_pool_create(threads, MAX_PIXELS)
            # Reusable staging buffers (get() is serialized by design; a
            # fresh 12.6 MB pair per frame is pure allocator churn).
            self._gray_buf = np.empty(MAX_PIXELS, np.float32)
            self._depth_buf = np.empty(MAX_PIXELS, np.float32)
            self._fill(0)

    def _fill(self, upto_base: int):
        while (
            self._submitted < len(self.pairs)
            and self._submitted <= upto_base + self.lookahead
        ):
            rgb, dep = self.pairs[self._submitted]
            self._lib.ql_pool_submit(
                self._pool, self._submitted, rgb.encode(), dep.encode(),
                ctypes.c_float(self.depth_scale),
            )
            self._submitted += 1

    def get(self, idx: int):
        """(gray f32 (H, W), depth f32 (H, W)) or None.  Positions must be
        consumed in order, 0..len(pairs)-1 (the caller pre-applies frame
        subsampling when building `pairs`)."""
        if self._pool is None:
            return None
        self._fill(idx)
        if idx >= self._submitted:
            return None
        gray, depth = self._gray_buf, self._depth_buf
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        fp = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.ql_pool_wait(
            self._pool, idx, gray.ctypes.data_as(fp), depth.ctypes.data_as(fp),
            ctypes.byref(w), ctypes.byref(h), MAX_PIXELS,
        )
        self._fill(idx + 1)
        if rc != 0:
            return None
        n = w.value * h.value
        return (
            gray[:n].reshape(h.value, w.value).copy(),
            depth[:n].reshape(h.value, w.value).copy(),
        )

    def close(self):
        if self._pool is not None:
            self._lib.ql_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
