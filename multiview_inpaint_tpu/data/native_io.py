"""ctypes bindings for the native data-IO library (native/dataio.cpp).

Provides:
- :func:`decode_png` — native PNG -> RGB8 numpy (PIL fallback),
- :class:`PrefetchLoader` — pthread-pool file prefetch + decode, used by
  the SVD datasets to overlap the next clip's 14-frame decode with the
  current train step.

The shared library is built on first use (``make -C native``) and cached;
everything degrades gracefully to PIL when a toolchain isn't available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmvi_dataio.so")
_lib = None
_lib_lock = threading.Lock()


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mvi_png_info.restype = ctypes.c_int
            lib.mvi_png_info.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.mvi_png_decode_rgb8.restype = ctypes.c_int
            lib.mvi_png_decode_rgb8.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_int]
            lib.mvi_loader_create.restype = ctypes.c_void_p
            lib.mvi_loader_create.argtypes = [ctypes.c_int]
            lib.mvi_loader_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p]
            lib.mvi_loader_take_rgb8.restype = ctypes.c_int
            lib.mvi_loader_take_rgb8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.mvi_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib = False
        return _lib or None


def native_available() -> bool:
    return _load_lib() is not None


def decode_png(path: str) -> np.ndarray:
    """PNG file -> [H, W, 3] uint8 (native; PIL fallback)."""
    lib = _load_lib()
    if lib is None:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    data = open(path, "rb").read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.mvi_png_info(data, len(data), ctypes.byref(w),
                        ctypes.byref(h)) != 0:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.mvi_png_decode_rgb8(
        data, len(data), out.ctypes.data_as(ctypes.c_char_p),
        w.value, h.value)
    if rc != 0:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    return out


class PrefetchLoader:
    """Threaded native file prefetcher: submit paths, take decoded RGB."""

    def __init__(self, n_threads: int = 4,
                 max_bytes: int = 4096 * 4096 * 3):
        self._lib = _load_lib()
        self._max_bytes = max_bytes
        self._next_id = 0
        if self._lib is not None:
            self._handle = self._lib.mvi_loader_create(n_threads)
        else:
            self._handle = None
            self._fallback = {}

    def submit(self, path: str) -> int:
        job = self._next_id
        self._next_id += 1
        if self._handle is not None:
            self._lib.mvi_loader_submit(self._handle, job,
                                        path.encode("utf-8"))
        else:
            self._fallback[job] = path
        return job

    def take(self, job: int) -> np.ndarray:
        if self._handle is None:
            return decode_png(self._fallback.pop(job))
        buf = np.empty((self._max_bytes,), np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.mvi_loader_take_rgb8(
            self._handle, job, buf.ctypes.data_as(ctypes.c_char_p),
            self._max_bytes, ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"native loader failed for job {job} (rc={rc})")
        return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3)

    def close(self):
        if self._handle is not None:
            self._lib.mvi_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
