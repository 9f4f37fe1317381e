"""ctypes bindings for the native threaded image loader (native/imageio.cpp).

Replaces the per-image PIL decode+resize in the dataset hot path with a C++
thread pool (libpng/libjpeg). Falls back to PIL transparently when the
shared library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libevoworld_io.so")
_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ev_load_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ev_load_image.restype = ctypes.c_int
    lib.ev_load_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ev_load_image_batch.restype = ctypes.c_int
    if hasattr(lib, "ev_save_png_batch"):  # older builds lack the encoder
        lib.ev_save_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ev_save_png_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_image_batch(
    paths: Sequence[str],
    height: int,
    width: int,
    minus1_1: bool = True,
    n_threads: int = 0,
) -> np.ndarray:
    """Load N images -> (N, H, W, 3) float32, resized bilinearly.

    Uses the native loader when built, PIL otherwise.
    """
    n = len(paths)
    lib = _load_lib()
    if lib is not None:
        out = np.empty((n, height, width, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        threads = n_threads or min(os.cpu_count() or 1, 8)
        failed = lib.ev_load_image_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            height, width, int(minus1_1), threads,
        )
        if failed:
            raise IOError(f"native loader failed on {failed}/{n} images")
        return out

    from PIL import Image

    frames = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        if img.size != (width, height):
            img = img.resize((width, height), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        frames.append(a * 2.0 - 1.0 if minus1_1 else a)
    return np.stack(frames)


def save_png_batch(paths: Sequence[str], frames: np.ndarray, n_threads: int = 0) -> bool:
    """Write (N, H, W, 3) uint8 frames to PNG files with the C++ thread pool.

    Returns False when the native library is unavailable or lacks the
    encoder (callers fall back to PIL); raises on actual write failures.
    """
    lib = _load_lib()
    if lib is None or not hasattr(lib, "ev_save_png_batch"):
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3 and n == len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = n_threads or min(os.cpu_count() or 1, 8)
    failed = lib.ev_save_png_batch(
        arr, frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, threads,
    )
    if failed:
        raise IOError(f"native encoder failed on {failed}/{n} images")
    return True
