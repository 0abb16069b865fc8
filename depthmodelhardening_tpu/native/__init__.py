"""Native IO bindings: build-on-first-use C library with a numerically
matching numpy/PIL fallback.

`load_image(path)` -> float32 (H, W, 3) in [0, 1]
`load_resized(path, h, w)` -> float32 (h, w, 3) in [0, 1] (torch
half-pixel bilinear — IDENTICAL numerics on the native and fallback
paths, so metrics don't drift between hosts with/without a toolchain)

The shared library is compiled once with cc -O2 (to a temp file, then
atomically renamed) under a lock; any failure falls back silently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.c")
_SO = os.path.join(_DIR, "_fastio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    """Compile to a temp file and atomically rename — concurrent
    builders can't leave a torn .so behind."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["cc", "-O2", "-shared", "-fPIC", _SRC, "-o", tmp,
           "-lpng", "-ljpeg"]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            os.unlink(tmp)
            return False
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.image_dims.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                               ctypes.c_int, ctypes.c_int]
    lib.resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int]
    lib.decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_int]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (not os.path.exists(_SO) or
                 os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError:
            # a stale/corrupt .so from an older build: rebuild once
            if _build():
                try:
                    _lib = _bind(ctypes.CDLL(_SO))
                except OSError:
                    _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def image_dims(path: str) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.image_dims(path.encode(), ctypes.byref(h),
                      ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image

    with open(path, "rb") as f:
        return np.asarray(Image.open(f).convert("RGB"),
                          np.float32) / 255.0


def _half_pixel_resize(img: np.ndarray, out_h: int,
                       out_w: int) -> np.ndarray:
    """numpy torch-half-pixel bilinear — matches the C resampler (and
    ops/resize.py) exactly, unlike PIL's antialiased BILINEAR."""
    h, w = img.shape[:2]
    if h == out_h and w == out_w:
        return img.astype(np.float32)

    def axis(n_in, n_out):
        s = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                    0, n_in - 1)
        lo = np.floor(s).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (s - lo).astype(np.float32)

    y0, y1, fy = axis(h, out_h)
    x0, x1, fx = axis(w, out_w)
    top = img[y0][:, x0] * (1 - fx)[None, :, None] + \
        img[y0][:, x1] * fx[None, :, None]
    bot = img[y1][:, x0] * (1 - fx)[None, :, None] + \
        img[y1][:, x1] * fx[None, :, None]
    return (top * (1 - fy)[:, None, None] +
            bot * fy[:, None, None]).astype(np.float32)


def load_image(path: str) -> np.ndarray:
    """float32 (H, W, 3) in [0, 1]; PIL fallback (decode is bit-exact
    either way)."""
    lib = _load()
    if lib is not None:
        dims = image_dims(path)
        if dims is not None:
            h, w = dims
            buf = np.empty((h, w, 3), np.uint8)
            if lib.decode_rgb(path.encode(),
                              buf.ctypes.data_as(ctypes.c_void_p),
                              h, w) == 0:
                return buf.astype(np.float32) / 255.0
    return _pil_decode(path)


def load_resized(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Fused decode + half-pixel bilinear resize. The fallback decodes
    with PIL but resizes with the same numpy half-pixel kernel, so both
    paths are numerically identical."""
    lib = _load()
    if lib is not None:
        out = np.empty((out_h, out_w, 3), np.float32)
        if lib.decode_resize(path.encode(),
                             out.ctypes.data_as(ctypes.c_void_p),
                             out_h, out_w) == 0:
            return out
    return _half_pixel_resize(_pil_decode(path), out_h, out_w)
