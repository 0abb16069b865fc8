"""Native IO bindings: build-on-first-use C library with PIL fallback.

`load_image(path)` -> float32 (H, W, 3) in [0, 1]
`load_resized(path, h, w)` -> float32 (h, w, 3) in [0, 1] (torch
half-pixel bilinear)

The shared library is compiled once with cc -O2 into this package
directory; any failure (no compiler, missing libpng/libjpeg) silently
falls back to PIL so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.c")
_SO = os.path.join(_DIR, "_fastio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["cc", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
           "-lpng", "-ljpeg"]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.image_dims.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int]
    lib.decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


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


def load_image(path: str) -> np.ndarray:
    """float32 (H, W, 3) in [0, 1]; PIL fallback."""
    lib = _load()
    if lib is not None:
        dims = image_dims(path)
        if dims is not None:
            h, w = dims
            buf = np.empty((h, w, 3), np.uint8)
            if lib.decode_rgb(path.encode(),
                              buf.ctypes.data_as(ctypes.c_void_p)) == 0:
                return buf.astype(np.float32) / 255.0
    from PIL import Image

    with open(path, "rb") as f:
        return np.asarray(Image.open(f).convert("RGB"),
                          np.float32) / 255.0


def load_resized(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Fused decode + half-pixel bilinear resize; PIL fallback."""
    lib = _load()
    if lib is not None:
        out = np.empty((out_h, out_w, 3), np.float32)
        if lib.decode_resize(path.encode(),
                             out.ctypes.data_as(ctypes.c_void_p),
                             out_h, out_w) == 0:
            return out
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB").resize((out_w, out_h),
                                                  Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0
