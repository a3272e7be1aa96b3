"""ctypes bindings for the native host runtime (native/*.cc).

Falls back gracefully when ``adamvs_tpu/_native/libmvsnative.so`` hasn't been
built (``native/build.sh``); callers check ``available()`` or use the
``*_or_fallback`` helpers in ``io.images``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "_native", "libmvsnative.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.mvs_png_info.restype = ctypes.c_int
    lib.mvs_png_decode.restype = ctypes.c_int
    lib.mvs_exr_info.restype = ctypes.c_int
    lib.mvs_exr_read_depth.restype = ctypes.c_int
    lib.mvs_native_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> [H,W,C] uint8 or [H,W,C] uint16 array
    (C dropped when 1)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    bd = ctypes.c_int32()
    rc = lib.mvs_png_info(buf, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(c), ctypes.byref(bd))
    if rc != 0:
        raise ValueError(f"mvs_png_info failed: {rc}")
    dtype = np.uint8 if bd.value == 8 else np.uint16
    out = np.empty((h.value, w.value, c.value), dtype=dtype)
    rc = lib.mvs_png_decode(buf, len(data), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"mvs_png_decode failed: {rc}")
    return out[..., 0] if c.value == 1 else out


def read_png(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_png(f.read())


def read_exr_depth(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    with open(path, "rb") as f:
        data = f.read()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.mvs_exr_info(buf, len(data), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"mvs_exr_info failed: {rc}")
    out = np.empty((h.value, w.value), dtype=np.float32)
    rc = lib.mvs_exr_read_depth(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        raise ValueError(f"mvs_exr_read_depth failed: {rc}")
    return out


def center_image(img: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    out = np.empty((h, w, c), dtype=np.float32)
    lib.mvs_center_image_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    out = np.empty((dh, dw, c), dtype=np.uint8)
    lib.mvs_resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return out
