"""ctypes binding to the native host-IO runtime (native/neurons_io.cpp).

Loads `native/libneurons_io.so`, building it with `make` on first use if
the toolchain is available. Every entry point has a pure-Python
fallback, so the package works without a compiler; the native paths are
the fast ones (threaded GIF codec for the 1200-clip stage-5/6 artifact
loop, thread-pooled pread for the data loader).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libneurons_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.gif_encode.restype = ctypes.c_int
        lib.gif_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.gif_decode.restype = ctypes.c_int
        lib.gif_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_void_p]
        lib.neurons_free.argtypes = [ctypes.c_void_p]
        lib.parallel_read.restype = ctypes.c_int
        lib.parallel_read.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode_gif(frames: np.ndarray, delay_ms: int = 125,
               threads: int = 8) -> Optional[bytes]:
    """frames [F, H, W, 3] uint8 -> GIF bytes, or None if native missing."""
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int64()
    rc = lib.gif_encode(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        int(delay_ms), threads, ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        return None
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.neurons_free(out)


def decode_gif(data: bytes) -> Optional[np.ndarray]:
    """GIF bytes -> [F, H, W, 3] uint8, or None on unsupported input."""
    lib = _load()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.gif_decode(buf, len(data), ctypes.byref(n), ctypes.byref(h),
                        ctypes.byref(w), None)
    if rc != 0 or n.value <= 0:
        return None
    out = np.empty((n.value, h.value, w.value, 3), np.uint8)
    rc = lib.gif_decode(buf, len(data), ctypes.byref(n), ctypes.byref(h),
                        ctypes.byref(w),
                        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def parallel_read(paths: Sequence[str], offsets: Sequence[int],
                  sizes: Sequence[int], threads: int = 8
                  ) -> Optional[List[np.ndarray]]:
    """Thread-pooled pread of byte ranges -> list of uint8 arrays, or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    bufs = [np.empty(int(s), np.uint8) for s in sizes]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_off = (ctypes.c_int64 * n)(*[int(o) for o in offsets])
    c_sz = (ctypes.c_int64 * n)(*[int(s) for s in sizes])
    c_dst = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    failed = lib.parallel_read(c_paths, c_off, c_sz, c_dst, n, threads)
    if failed:
        return None
    return bufs
