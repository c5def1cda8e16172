"""ctypes bindings for the native host-preprocessing library.

Compiles ``preprocess.cc`` on demand into ``libtepreprocess.so`` next to this
file (cached across runs) and exposes:

  * :func:`normalize_chw`  — uint8 (B,H,W,3) -> float32 (B,3,H,W) mean/std
  * :func:`resize_bilinear_chw` — float32 (B,C,H,W) -> (B,C,OH,OW)

Every function has a numpy fallback (``native=False`` or g++ unavailable),
so the package never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtepreprocess.so")
_SRC = os.path.join(_DIR, "preprocess.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

DEFAULT_THREADS = min(16, os.cpu_count() or 1)


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
           _SRC, "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native build failed (%s); using numpy fallback", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        i64, f32p, u8p, ci = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                              ctypes.POINTER(ctypes.c_uint8), ctypes.c_int)
        lib.te_normalize_chw.argtypes = [u8p, f32p, i64, i64, i64, f32p,
                                         f32p, ci]
        lib.te_resize_bilinear_chw.argtypes = [f32p, f32p, i64, i64, i64,
                                               i64, i64, i64, ci]
        _lib = lib
        return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalize_chw(images: np.ndarray, mean, std, native: bool = True,
                  threads: int = DEFAULT_THREADS) -> np.ndarray:
    """uint8 (B,H,W,3) -> float32 (B,3,H,W): (x/255 - mean)/std."""
    images = np.ascontiguousarray(images, np.uint8)
    B, H, W, C = images.shape
    assert C == 3, images.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = load() if native else None
    if lib is None:
        out = images.astype(np.float32) / 255.0
        out = (out - mean) / std
        return np.ascontiguousarray(out.transpose(0, 3, 1, 2))
    dst = np.empty((B, 3, H, W), np.float32)
    lib.te_normalize_chw(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _f32p(dst),
        B, H, W, _f32p(mean), _f32p(std), threads)
    return dst


def resize_bilinear_chw(x: np.ndarray, out_h: int, out_w: int,
                        native: bool = True,
                        threads: int = DEFAULT_THREADS) -> np.ndarray:
    """float32 (B,C,H,W) -> (B,C,out_h,out_w), align_corners=false."""
    x = np.ascontiguousarray(x, np.float32)
    B, C, H, W = x.shape
    lib = load() if native else None
    if lib is None:
        import jax
        return np.asarray(jax.image.resize(
            x, (B, C, out_h, out_w), "bilinear"))
    dst = np.empty((B, C, out_h, out_w), np.float32)
    lib.te_resize_bilinear_chw(_f32p(x), _f32p(dst), B, C, H, W,
                               out_h, out_w, threads)
    return dst

