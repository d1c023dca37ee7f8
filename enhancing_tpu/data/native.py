"""ctypes bindings for the native (C++) image ops, with graceful fallback.

The loader uses these when the shared library builds (build-on-first-use,
like the reference's JIT CUDA extensions — fused_act.py:11-17); otherwise the
numpy/PIL paths in transforms.py serve identically.
"""
from __future__ import annotations

import ctypes
import warnings

import numpy as np

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from pathlib import Path
        import sys
        root = Path(__file__).resolve().parents[2]
        sys.path.insert(0, str(root / "native"))
        try:
            from build import build  # type: ignore
        finally:
            sys.path.pop(0)
        lib = ctypes.CDLL(str(build()))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.resize_bilinear_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
        lib.crop_flip_normalize.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                            ctypes.c_int, f32p]
        lib.u8_to_f32.argtypes = [u8p, f32p, i64]
        _lib = lib
    except Exception as e:  # toolchain missing etc.
        warnings.warn(f"native image ops unavailable ({e}); "
                      "using numpy/PIL fallback")
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """HWC uint8 bilinear resize via the native lib."""
    lib = get_lib()
    assert lib is not None and img.dtype == np.uint8
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(_u8ptr(img), h, w, c, _u8ptr(out), oh, ow)
    return out


def crop_flip_normalize(img: np.ndarray, top: int, left: int, size: int,
                        flip: bool) -> np.ndarray:
    lib = get_lib()
    assert lib is not None and img.dtype == np.uint8
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((size, size, c), np.float32)
    lib.crop_flip_normalize(_u8ptr(img), h, w, c, top, left, size,
                            int(flip), _f32ptr(out))
    return out
